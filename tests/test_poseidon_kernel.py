"""Device (jnp) Poseidon vs host oracle — bit-exact across arities/fields.

The XLA CPU compile of the batched kernel is pathological on some hosts
(20+ GB RSS); the jnp-kernel cases are gated behind LURK_TPU_SLOW_TESTS
and the default coverage runs the native C++ batch hasher against the
host oracle (plus the pinned commitment anchor).
"""

import os
import random

import pytest

from lurk_tpu.fields import BN256_SCALAR, PALLAS_SCALAR
from lurk_tpu.poseidon.host import hash_preimage

rng = random.Random(7)

slow = pytest.mark.skipif(
    not os.environ.get("LURK_TPU_SLOW_TESTS"),
    reason="XLA CPU kernel compile is pathological on this host; set "
           "LURK_TPU_SLOW_TESTS=1")


@pytest.mark.parametrize("arity", [3, 4, 6, 8])
def test_native_batch_matches_host_bn256(arity):
    from lurk_tpu.native import poseidon as npos
    if not npos.available():
        pytest.skip("no C++ toolchain")
    field = BN256_SCALAR
    pres = [
        tuple(rng.randrange(field.modulus) for _ in range(arity))
        for _ in range(5)
    ] + [tuple([0] * arity)]
    got = npos.hash_batch(field, arity, pres)
    want = [hash_preimage(field, p) for p in pres]
    assert got == want


def test_native_batch_anchor_commitment():
    from lurk_tpu.native import poseidon as npos
    if not npos.available():
        pytest.skip("no C++ toolchain")
    got = npos.hash_batch(BN256_SCALAR, 3, [(0, 4, 0)])
    assert got[0] == int(
        "1d501baeefe83acf0e7137180b091834f542a5059dbaf99ec82c5e19d3bb9201", 16
    )


@slow
@pytest.mark.parametrize("arity", [3, 4, 6, 8])
def test_kernel_matches_host_bn256(arity):
    from lurk_tpu.poseidon.kernel import hash_batch
    field = BN256_SCALAR
    pres = [
        tuple(rng.randrange(field.modulus) for _ in range(arity))
        for _ in range(5)
    ] + [tuple([0] * arity)]
    got = hash_batch(field, arity, pres)
    want = [hash_preimage(field, p) for p in pres]
    assert got == want


@slow
def test_kernel_matches_host_pallas():
    from lurk_tpu.poseidon.kernel import hash_batch
    field = PALLAS_SCALAR
    pres = [tuple(rng.randrange(field.modulus) for _ in range(4))
            for _ in range(4)]
    got = hash_batch(field, 4, pres)
    assert got == [hash_preimage(field, p) for p in pres]
