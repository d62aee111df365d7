"""Native C++ host components: bit-exact parity vs the Python oracles
(the reference's keystone equivalence pattern, proof/tests/mod.rs:247)."""

import random

import pytest

from lurk_tpu.curves.weierstrass import BN254_G1, PALLAS, VESTA
from lurk_tpu.fields import BN256_SCALAR, PALLAS_SCALAR
from lurk_tpu.native import msm as nmsm
from lurk_tpu.native import r1cs as nr1cs

pytestmark = pytest.mark.skipif(
    not nmsm.available(), reason="no C++ toolchain")


@pytest.mark.parametrize("curve", [PALLAS, VESTA, BN254_G1],
                         ids=lambda c: c.name)
def test_native_msm_matches_python(curve):
    r = random.Random(11)
    n = 300
    pts = []
    acc = None
    for _ in range(n):
        acc = curve.add(acc, curve.generator)
        pts.append(acc)
    pts[5] = None                      # infinity in the mix
    scalars = [r.randrange(curve.order) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = curve.order - 1
    # python oracle (force the non-native path)
    n_windows = (curve.scalar.num_bits + 7) // 8
    jpts = [curve.jac_from_affine(pt) for pt in pts]
    accj = (0, 1, 0)
    for w in range(n_windows - 1, -1, -1):
        for _ in range(8):
            accj = curve.jac_double(accj)
        buckets = [(0, 1, 0)] * 256
        for s, pt in zip(scalars, jpts):
            d = (s >> (8 * w)) & 255
            if d:
                buckets[d] = curve.jac_add(buckets[d], pt)
        run = (0, 1, 0)
        total = (0, 1, 0)
        for d in range(255, 0, -1):
            run = curve.jac_add(run, buckets[d])
            total = curve.jac_add(total, run)
        accj = curve.jac_add(accj, total)
    want = curve.jac_to_affine(accj)
    for c in (3, 8, 13):
        assert nmsm.msm(curve, scalars, pts, c=c) == want


def test_native_msm_empty_and_zero():
    assert nmsm.msm(PALLAS, [], []) is None
    g = PALLAS.generator
    assert nmsm.msm(PALLAS, [0, 0], [g, g], c=4) is None


@pytest.mark.parametrize("algo", [0, 1], ids=["serial", "batch-affine"])
def test_native_msm_batch_affine_special_pairs(algo, monkeypatch):
    """Exercise annihilation (P + (-P)) and doubling (P + P) in the same
    bucket on BOTH accumulation paths: serial mixed adds (algo 0) and
    the batch-affine annihilation/doubling/compaction path (algo 1) —
    the special-case handling is entirely disjoint between them."""
    monkeypatch.setenv("LURK_MSM_ALGO", str(algo))
    g = PALLAS.generator
    neg = (g[0], PALLAS.p - g[1])
    g2 = PALLAS.add(g, g)
    # bucket 1 of window 0 gets [P, -P] -> empty bucket
    assert nmsm.msm(PALLAS, [1, 1], [g, neg], c=4) is None
    # [P, -P, P] -> survivor P
    assert nmsm.msm(PALLAS, [1, 1, 1], [g, neg, g], c=4) == g
    # [P, P, P, P] -> two doublings -> 4P
    want4 = PALLAS.add(g2, g2)
    assert nmsm.msm(PALLAS, [1] * 4, [g] * 4, c=4) == want4
    # mixed digits + doubling + annihilation across buckets
    scalars = [3, 3, 5, 5, 7, 7, 2]
    pts = [g, g, g, neg, g2, g2, g2]
    want = None
    for s, pt in zip(scalars, pts):
        want = PALLAS.add(want, PALLAS.mul(s, pt))
    assert nmsm.msm(PALLAS, scalars, pts, c=4) == want


def _rand_shape(field, r):
    from lurk_tpu.proof.nova import R1CSShape
    from lurk_tpu.r1cs.cs import ConstraintSystem
    from lurk_tpu.r1cs.gadgets import (
        add, alloc_input_num, alloc_num, enforce_equal, mul,
    )
    cs = ConstraintSystem(field)
    xs = [alloc_input_num(cs, r.randrange(cs.p)) for _ in range(4)]
    ws = [alloc_num(cs, r.randrange(cs.p)) for _ in range(64)]
    acc = xs[0]
    for w in ws:
        acc = mul(cs, acc, add(cs, w, xs[1]))
    enforce_equal(cs, acc, acc)
    return R1CSShape(cs), cs.inputs[1:], list(cs.aux)


@pytest.mark.parametrize("field", [BN256_SCALAR, PALLAS_SCALAR],
                         ids=lambda f: f.name)
def test_native_r1cs_matches_python(field):
    from lurk_tpu.proof.nova import (
        RelaxedInstance, RelaxedWitness, z_vector,
    )
    r = random.Random(5)
    shape, x, w = _rand_shape(field, r)
    p = shape.p
    z2 = z_vector(shape, x, w, 1)
    assert nr1cs.matvecs(shape, z2) == shape.matvecs(z2)
    inst = RelaxedInstance(None, None,
                           [r.randrange(p) for _ in x], r.randrange(p))
    wit = RelaxedWitness([r.randrange(p) for _ in w],
                         [r.randrange(p) for _ in range(
                             shape.num_constraints)])
    z1 = z_vector(shape, inst.x, wit.w, inst.u)
    az1, bz1, cz1 = shape.matvecs(z1)
    az2, bz2, cz2 = shape.matvecs(z2)
    py = [(a1 * b2 + a2 * b1 - inst.u * c2 - c1) % p
          for a1, b1, c1, a2, b2, c2 in
          zip(az1, bz1, cz1, az2, bz2, cz2)]
    assert nr1cs.cross_term(shape, z1, inst.u, z2) == py
    # satisfiability checks agree with definitional arithmetic
    assert nr1cs.check_relaxed(shape, z2, 1,
                               [0] * shape.num_constraints)
    bad_e = [1] + [0] * (shape.num_constraints - 1)
    assert not nr1cs.check_relaxed(shape, z2, 1, bad_e)


def test_native_pedersen_generators_bit_exact():
    """native/pedersen.cpp (shake256 try-and-increment + Tonelli-Shanks)
    vs the pure-python deriver, all four curves, incl. offsets."""
    from lurk_tpu.curves.weierstrass import (
        BN254_G1, GRUMPKIN, PALLAS, VESTA,
    )
    from lurk_tpu.native import pedersen as npe

    if not npe.available():
        import pytest
        pytest.skip("no native toolchain")
    for curve in (PALLAS, VESTA, BN254_G1, GRUMPKIN):
        # < 64 generators routes derive_generators_from to pure python
        py = curve.derive_generators_from(b"ck-test", 0, 40)
        nat = npe.derive_generators_from(curve, b"ck-test", 0, 40)
        assert nat == py, curve.name
        py_off = curve.derive_generators_from(b"ck-test", 37, 40)
        nat_off = npe.derive_generators_from(curve, b"ck-test", 37, 40)
        assert nat_off == py_off == py[37:40], curve.name
        for x, y in nat:
            assert (y * y - (x ** 3 + curve.b)) % curve.p == 0


def test_fastpack_roundtrip_and_fallback():
    from lurk_tpu.native import fastpack as fp

    cases = [0, 1, (1 << 256) - 1, 0xDEADBEEF << 200, 7]
    assert fp.unpack_ints(fp.pack_ints(cases)) == cases
    import pytest
    with pytest.raises(OverflowError):
        fp.pack_ints([-1])
    with pytest.raises(OverflowError):
        fp.pack_ints([1 << 256])


def test_native_vec_rlc_bit_exact():
    import random

    from lurk_tpu.fields import BN256_SCALAR as F
    from lurk_tpu.native import r1cs as nr

    if not nr.available():
        import pytest
        pytest.skip("no native toolchain")
    r = random.Random(9)
    p = F.modulus
    n = 2048
    a = [r.randrange(p) for _ in range(n)]
    b = [r.randrange(p) for _ in range(n)]
    rr = r.randrange(p)
    assert nr.vec_rlc(p, a, b, rr) == [(x + rr * y) % p
                                       for x, y in zip(a, b)]


def test_pack_vec_canonicality_guard():
    """values >= p (boundary bucket) must take the explicit-mod path."""
    import numpy as np

    from lurk_tpu.fields import BN256_SCALAR as F
    from lurk_tpu.native.r1cs import _pack_vec, _unpack_vec

    p = F.modulus
    vec = [p + 5, 3, p - 1, 2 * p + 7]
    arr = _pack_vec(vec, p)
    assert _unpack_vec(arr, len(vec)) == [v % p for v in vec]
