"""Device (jnp) Poseidon vs host oracle — bit-exact across arities/fields."""

import random

import pytest

from lurk_tpu.fields import BN256_SCALAR, PALLAS_SCALAR
from lurk_tpu.poseidon.host import hash_preimage
from lurk_tpu.poseidon.kernel import hash_batch

rng = random.Random(7)


@pytest.mark.parametrize("arity", [3, 4, 6, 8])
def test_kernel_matches_host_bn256(arity):
    field = BN256_SCALAR
    pres = [
        tuple(rng.randrange(field.modulus) for _ in range(arity))
        for _ in range(5)
    ] + [tuple([0] * arity)]
    got = hash_batch(field, arity, pres)
    want = [hash_preimage(field, p) for p in pres]
    assert got == want


def test_kernel_matches_host_pallas():
    field = PALLAS_SCALAR
    pres = [tuple(rng.randrange(field.modulus) for _ in range(4))
            for _ in range(4)]
    got = hash_batch(field, 4, pres)
    assert got == [hash_preimage(field, p) for p in pres]


def test_kernel_anchor_commitment():
    got = hash_batch(BN256_SCALAR, 3, [(0, 4, 0)])
    assert got[0] == int(
        "1d501baeefe83acf0e7137180b091834f542a5059dbaf99ec82c5e19d3bb9201", 16
    )
