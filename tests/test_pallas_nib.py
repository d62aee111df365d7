"""Digest parity for the 5th/6th-gen int8 nibble Poseidon kernels
(CPU interpret mode; TPU validation happens in bench.py's ladder).

Oracle: poseidon.host.hash_preimage (Neptune-parity, pinned against the
reference anchors in test_poseidon_host.py)."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lurk_tpu.fields import PALLAS_SCALAR as F
from lurk_tpu.ops import nibbles as NB
from lurk_tpu.poseidon import pallas_nib as PN
from lurk_tpu.poseidon.host import hash_preimage


def _pack(pres, arity, size):
    arr = np.zeros((arity, 16, size), dtype=np.uint32)
    for j, pre in enumerate(pres):
        for a, v in enumerate(pre):
            arr[a, :, j] = NB._int_to_limbs(v, 16)
    return jnp.asarray(arr)


def _unpack(out, n):
    res = []
    for j in range(n):
        res.append(sum(int(out[i, j]) << (16 * i) for i in range(16)))
    return res


def _cases(arity, n):
    r = random.Random(1234 + arity)
    pres = [tuple(r.randrange(F.modulus) for _ in range(arity))
            for _ in range(n - 2)]
    pres.append((0,) * arity)
    pres.append((F.modulus - 1,) * arity)
    return pres


@pytest.mark.parametrize("arity", [3, 4, 6, 8])
def test_pallas_nib_parity(arity):
    pres = _cases(arity, 6)
    x = _pack(pres, arity, 8)
    h = jax.jit(PN.build_pallas_nib_hasher(F, arity, 8))
    got = _unpack(np.asarray(h(x)), len(pres))
    assert got == [hash_preimage(F, p) for p in pres]


def test_pallas_nib_opt_parity():
    arity = 4
    pres = _cases(arity, 6)
    x = _pack(pres, arity, 8)
    h = jax.jit(PN.build_pallas_nib_opt_hasher(F, arity, 8))
    got = _unpack(np.asarray(h(x)), len(pres))
    assert got == [hash_preimage(F, p) for p in pres]


def test_pallas_nib_bn256():
    """Hydration also hashes over bn256 (default CLI field)."""
    from lurk_tpu.fields import BN256_SCALAR
    from lurk_tpu.poseidon.pallas_nib import hash_batch_pallas_nib
    import random
    r = random.Random(99)
    pres = [tuple(r.randrange(BN256_SCALAR.modulus) for _ in range(4))
            for _ in range(3)]
    got = hash_batch_pallas_nib(BN256_SCALAR, 4, pres, tile=4)
    assert got == [hash_preimage(BN256_SCALAR, p) for p in pres]


@pytest.mark.parametrize("arity", [3, 4, 6, 8])
def test_pallas_nib12_parity(arity):
    from lurk_tpu.poseidon import pallas_nib12 as PN12
    pres = _cases(arity, 6)
    x = _pack(pres, arity, 8)
    h = jax.jit(PN12.build_pallas_nib12_hasher(F, arity, 8))
    got = _unpack(np.asarray(h(x)), len(pres))
    assert got == [hash_preimage(F, p) for p in pres]


def test_pallas_nib12_bn256():
    from lurk_tpu.fields import BN256_SCALAR
    from lurk_tpu.poseidon.pallas_nib12 import hash_batch_pallas_nib12
    r = random.Random(99)
    pres = [tuple(r.randrange(BN256_SCALAR.modulus) for _ in range(4))
            for _ in range(3)]
    got = hash_batch_pallas_nib12(BN256_SCALAR, 4, pres, tile=4)
    assert got == [hash_preimage(BN256_SCALAR, p) for p in pres]
