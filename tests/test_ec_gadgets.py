"""In-circuit EC gadgets vs the host curve oracle (pure host, no jax).

The augmented-circuit fold verifier manipulates commitment points of the
OTHER curve in the cycle natively: circuit field = that curve's base
field. Tests run over Vesta points in a Pallas-scalar-field circuit
(and one Grumpkin case for the bn256 cycle)."""

import random

import pytest

from lurk_tpu.curves.weierstrass import GRUMPKIN, VESTA
from lurk_tpu.r1cs.cs import ConstraintSystem
from lurk_tpu.r1cs.ec_gadgets import (
    AllocatedPoint, ec_add, ec_normalize, ec_scalar_mul, ec_select,
    enforce_on_curve,
)
from lurk_tpu.r1cs.gadgets import alloc_bit

rng = random.Random(7)


def _rand_pt(curve):
    return curve.mul(rng.randrange(1, curve.order), curve.generator)


def _cs(curve):
    return ConstraintSystem(curve.base, check=True)


@pytest.mark.parametrize("curve", [VESTA, GRUMPKIN], ids=lambda c: c.name)
def test_ec_add_matches_host(curve):
    cs = _cs(curve)
    a, b = _rand_pt(curve), _rand_pt(curve)
    pa = AllocatedPoint.alloc_affine(cs, a)
    pb = AllocatedPoint.alloc_affine(cs, b)
    enforce_on_curve(cs, curve, pa)
    enforce_on_curve(cs, curve, pb)
    out = ec_add(cs, curve, pa, pb)
    assert out.value(curve) == curve.add(a, b)
    # doubling through the same complete formula
    dbl = ec_add(cs, curve, pa, pa)
    assert dbl.value(curve) == curve.double(a)
    # identity cases
    ident = AllocatedPoint.identity(cs)
    assert ec_add(cs, curve, pa, ident).value(curve) == a
    assert ec_add(cs, curve, ident, pb).value(curve) == b
    neg = AllocatedPoint.alloc_affine(cs, curve.neg(a))
    assert ec_add(cs, curve, pa, neg).value(curve) is None
    assert cs.is_satisfied()


@pytest.mark.parametrize("curve", [VESTA], ids=lambda c: c.name)
def test_ec_scalar_mul_matches_host(curve):
    cs = _cs(curve)
    base = _rand_pt(curve)
    k = rng.randrange(1 << 64)
    bits = [alloc_bit(cs, bool((k >> i) & 1)) for i in range(64)]
    pt = AllocatedPoint.alloc_affine(cs, base)
    out = ec_scalar_mul(cs, curve, bits, pt)
    assert out.value(curve) == curve.mul(k, base)
    assert cs.is_satisfied()
    # k = 0 gives the identity
    zero_bits = [alloc_bit(cs, False) for _ in range(8)]
    assert ec_scalar_mul(cs, curve, zero_bits, pt).value(curve) is None


@pytest.mark.parametrize("curve", [VESTA], ids=lambda c: c.name)
def test_ec_normalize_and_select(curve):
    cs = _cs(curve)
    a = _rand_pt(curve)
    pa = AllocatedPoint.alloc_affine(cs, a)
    pb = AllocatedPoint.identity(cs)
    # select
    t, f = alloc_bit(cs, True), alloc_bit(cs, False)
    assert ec_select(cs, t, pa, pb).value(curve) == a
    assert ec_select(cs, f, pa, pb).value(curve) is None
    # normalize a projective sum back to affine
    s = ec_add(cs, curve, pa, pa)
    x, y, is_id = ec_normalize(cs, curve, s)
    want = curve.double(a)
    assert (x.value, y.value) == want and not is_id.value
    # identity normalizes to (0, 0) with the flag set
    xi, yi, idf = ec_normalize(cs, curve, pb)
    assert (xi.value, yi.value) == (0, 0) and idf.value
    assert cs.is_satisfied()
