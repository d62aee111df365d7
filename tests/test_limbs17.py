"""Second-generation MXU limb core (ops.limbs17) + MXU Poseidon kernel:
bit-exact vs python-int host arithmetic / the host Poseidon oracle.

The lazy-Montgomery R=2^272 design puts every constant multiply on the
MXU as an 8-bit digit-plane Toeplitz matmul (see limbs17 docstring);
these tests pin the exactness claims (f32 accumulation never rounds)."""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lurk_tpu.fields import BN256_SCALAR, PALLAS_SCALAR
from lurk_tpu.ops import limbs17 as LZ
from lurk_tpu.poseidon.host import hash_preimage

rng = random.Random(3)


def _dev(f, values):
    return [jnp.asarray(x) for x in LZ.unstack(jnp.asarray(
        f.from_ints(values)))]


def _ints(f, limbs):
    return f.to_ints(np.stack([np.asarray(x) for x in limbs]))


@pytest.mark.parametrize("spec", [BN256_SCALAR, PALLAS_SCALAR],
                         ids=lambda s: s.name)
def test_mont_mul_roundtrip(spec):
    f = LZ.lazy_field(spec)
    p = spec.modulus
    B = 8
    avals = [rng.randrange(p) for _ in range(B)]
    bvals = [rng.randrange(p) for _ in range(B)]
    am = LZ.to_mont(f, _dev(f, avals))
    bm = LZ.to_mont(f, _dev(f, bvals))
    cm = LZ.mont_mul(f, am, bm)
    assert _ints(f, LZ.from_mont(f, cm)) == [
        (x * y) % p for x, y in zip(avals, bvals)]
    assert _ints(f, LZ.from_mont(f, am)) == avals


@pytest.mark.parametrize("spec", [BN256_SCALAR, PALLAS_SCALAR],
                         ids=lambda s: s.name)
def test_lazy_domain_chain(spec):
    """Chained muls/adds stay exact through the lazy [0, 3p) domain."""
    f = LZ.lazy_field(spec)
    p = spec.modulus
    vals = [rng.randrange(p) for _ in range(4)]
    acc_m = LZ.to_mont(f, _dev(f, [1] * 4))
    expect = 1
    for _ in range(5):
        x = rng.randrange(p)
        xm = LZ.to_mont(f, _dev(f, [x] * 4))
        acc_m = LZ.mont_mul(f, LZ.add_limbs(acc_m, xm), xm)
        expect = ((expect + x) * x) % p
    assert _ints(f, LZ.from_mont(f, acc_m)) == [expect] * 4
    del vals


@pytest.mark.parametrize("arity", [4, 8])
def test_mxu_kernel_matches_host(arity):
    """XLA fori_loop MXU kernel vs host oracle (pallas field)."""
    from lurk_tpu.poseidon.mxu_kernel import build_mxu_hasher
    spec = PALLAS_SCALAR
    B = 8
    pres = [[rng.randrange(spec.modulus) for _ in range(arity)]
            for _ in range(B)]
    arr = np.zeros((arity, 16, B), dtype=np.uint32)
    for b, pre in enumerate(pres):
        for a, v in enumerate(pre):
            for i in range(16):
                arr[a, i, b] = (v >> (16 * i)) & 0xFFFF
    out = np.asarray(jax.jit(build_mxu_hasher(spec, arity))(
        jnp.asarray(arr)))
    got = [sum(int(out[i, b]) << (16 * i) for i in range(16))
           for b in range(B)]
    assert got == [hash_preimage(spec, pre) for pre in pres]


@pytest.mark.skipif(
    not os.environ.get("LURK_TPU_SLOW_TESTS"),
    reason="pallas interpret-mode compile is slow; "
           "set LURK_TPU_SLOW_TESTS=1")
def test_pallas_mxu_matches_host():
    from lurk_tpu.poseidon.pallas_mxu import build_pallas_mxu_hasher
    spec = PALLAS_SCALAR
    arity, B = 4, 8
    pres = [[rng.randrange(spec.modulus) for _ in range(arity)]
            for _ in range(B)]
    arr = np.zeros((arity, 16, B), dtype=np.uint32)
    for b, pre in enumerate(pres):
        for a, v in enumerate(pre):
            for i in range(16):
                arr[a, i, b] = (v >> (16 * i)) & 0xFFFF
    out = np.asarray(jax.jit(build_pallas_mxu_hasher(spec, arity, B))(
        jnp.asarray(arr)))
    got = [sum(int(out[i, b]) << (16 * i) for i in range(16))
           for b in range(B)]
    assert got == [hash_preimage(spec, pre) for pre in pres]
