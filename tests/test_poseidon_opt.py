"""Optimized Poseidon preprocessing (sparse partial-round matrices +
transported constants) is bit-exact against the standard host path —
and the in-chain post-adds really are element-0-only (the property the
sparse kernel relies on)."""

import random

import pytest

from lurk_tpu.fields import BN256_SCALAR, PALLAS_SCALAR
from lurk_tpu.poseidon.host import hash_preimage
from lurk_tpu.poseidon.opt_spec import (
    hash_preimage_opt, opt_poseidon_spec,
)


@pytest.mark.parametrize("field", [PALLAS_SCALAR, BN256_SCALAR],
                         ids=lambda f: f.name)
@pytest.mark.parametrize("arity", [3, 4, 6, 8])
def test_opt_matches_standard(field, arity):
    r = random.Random(arity)
    for _ in range(4):
        pre = [r.randrange(field.modulus) for _ in range(arity)]
        assert hash_preimage_opt(field, pre) == \
            hash_preimage(field, pre)
    # edge values
    assert hash_preimage_opt(field, [0] * arity) == \
        hash_preimage(field, [0] * arity)
    top = [field.modulus - 1] * arity
    assert hash_preimage_opt(field, top) == hash_preimage(field, top)


def test_in_chain_constants_are_element0_only():
    o = opt_poseidon_spec(PALLAS_SCALAR, 4)
    rf_half = o.spec.full_rounds // 2
    rp = o.spec.partial_rounds
    # post-adds of rounds rf_half-1 .. rf_half+rp-2 feed a sigma0:
    # after transport only element 0 may be nonzero
    for r in range(rf_half - 1, rf_half + rp - 1):
        assert not any(o.post_keys[r][1:]), r


def test_sparse_apply_cost_shape():
    o = opt_poseidon_spec(PALLAS_SCALAR, 4)
    t = o.spec.width
    assert len(o.sparse) == o.spec.partial_rounds
    for s in o.sparse:
        assert len(s.w) == t - 1 and len(s.v_hat) == t - 1
