"""EC + MSM: device kernels vs host (python-int) oracle, bit-exact."""

import numpy as np
import pytest

from lurk_tpu.curves.device import (
    ec_add, ec_neg, identity, points_from_device, points_to_device,
)
from lurk_tpu.curves.weierstrass import PALLAS, VESTA
from lurk_tpu.msm.pippenger import msm


@pytest.mark.parametrize("curve", [PALLAS, VESTA], ids=["pallas", "vesta"])
def test_host_group_law(curve):
    g = curve.generator
    assert curve.is_on_curve(g)
    g2 = curve.double(g)
    g3 = curve.add(g2, g)
    assert curve.is_on_curve(g2) and curve.is_on_curve(g3)
    assert curve.mul(3, g) == g3
    assert curve.add(g, curve.neg(g)) is None
    assert curve.mul(curve.order, g) is None
    # scalar distributivity
    a, b = 1234567890123456789, 987654321987654321
    lhs = curve.mul(a + b, g)
    rhs = curve.add(curve.mul(a, g), curve.mul(b, g))
    assert lhs == rhs


def _random_points(curve, n, seed=0):
    rng = np.random.default_rng(seed)
    pts = []
    for _ in range(n):
        k = int(rng.integers(1, 1 << 62))
        pts.append(curve.mul(k, curve.generator))
    return pts


def test_device_ec_add_matches_host():
    import jax
    curve = PALLAS
    pts = _random_points(curve, 8, seed=1)
    others = _random_points(curve, 8, seed=2)
    # include special cases: doubling, inverse, identity
    pts += [pts[0], pts[1], None]
    others += [pts[0], curve.neg(pts[1]), pts[2]]
    a = points_to_device(curve, pts)
    b = points_to_device(curve, others)
    add_j = jax.jit(lambda a, b: ec_add(curve, a, b))
    out = points_from_device(curve, add_j(a, b))
    expect = [curve.add(x, y) for x, y in zip(pts, others)]
    assert out == expect


def test_device_ec_neg_and_identity():
    import jax
    curve = PALLAS
    pts = _random_points(curve, 4, seed=3)
    a = points_to_device(curve, pts)
    add_j = jax.jit(lambda a, b: ec_add(curve, a, b))
    out = points_from_device(curve, add_j(a, ec_neg(curve, a)))
    assert out == [None] * 4
    ident = identity(curve, 4)
    out2 = points_from_device(curve, add_j(a, ident))
    assert out2 == pts


def test_generator_derivation_deterministic():
    gens1 = PALLAS.derive_generators(b"ck", 5)
    gens2 = PALLAS.derive_generators(b"ck", 5)
    assert gens1 == gens2
    assert all(PALLAS.is_on_curve(g) for g in gens1)
    assert len({g for g in gens1}) == 5


@pytest.mark.parametrize("n", [1, 7, 50])
def test_msm_matches_host(n):
    # all sizes pad to the same 64-wide shape -> one compiled kernel
    import random
    curve = PALLAS
    rng = random.Random(n)
    pts = _random_points(curve, n, seed=n)
    scalars = [rng.randrange(curve.order) for _ in range(n)]
    scalars[0] = 0  # zero scalar edge case
    got = msm(curve, scalars, pts)
    expect = curve.msm(scalars, pts)
    assert got == expect
