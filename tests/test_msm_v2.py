"""Device MSM v2 (sorted-segment Pippenger): bit-exactness vs the host
oracle, including the adversarial bucket patterns (the keystone
equivalence pattern of the reference, proof/tests/mod.rs:247)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from lurk_tpu.curves.weierstrass import BN254_G1, PALLAS
from lurk_tpu.msm import ec12 as E
from lurk_tpu.msm import fe12 as F
from lurk_tpu.msm.device_v2 import MsmTable, signed_digits


def _points(curve, n):
    pts, acc = [], None
    for _ in range(n):
        acc = curve.add(acc, curve.generator)
        pts.append(acc)
    return pts


@pytest.mark.parametrize("curve", [PALLAS, BN254_G1], ids=lambda c: c.name)
def test_fe12_roundtrip_and_ops(curve):
    ctx = F.fe12_ctx(curve.base)
    p = ctx.p
    r = random.Random(11)
    a = [r.randrange(p) for _ in range(6)]
    b = [r.randrange(p) for _ in range(6)]
    A = F.Fe(jnp.asarray(ctx.nf.from_ints(a).astype(np.int32)), p, 4096)
    B = F.Fe(jnp.asarray(ctx.nf.from_ints(b).astype(np.int32)), p, 4096)
    rinv = pow(F.R, p - 2, p)
    assert [v % p for v in F.to_ints(np.asarray(F.fe_mul(ctx, A, B).cols))] \
        == [(x * y * rinv) % p for x, y in zip(a, b)]
    s = F.fe_sub(ctx, A, B)
    assert [v % p for v in F.to_ints(np.asarray(s.cols))] \
        == [(x - y) % p for x, y in zip(a, b)]
    # signed (sub output) operand through a Montgomery product
    m2 = F.fe_mul(ctx, s, B)
    assert [v % p for v in F.to_ints(np.asarray(m2.cols))] \
        == [((x - y) * y * rinv) % p for x, y in zip(a, b)]


@pytest.mark.parametrize("curve", [PALLAS, BN254_G1], ids=lambda c: c.name)
def test_ec12_complete_formulas(curve):
    """Complete add/madd vs the affine oracle, incl. doubling,
    annihilation, and identity operands."""
    ctx = E.ec_ctx(curve)
    r = random.Random(3)
    A = [curve.mul(r.randrange(2, 1 << 64), curve.generator)
         for _ in range(6)]
    B = [curve.mul(r.randrange(2, 1 << 64), curve.generator)
         for _ in range(6)]
    B[3] = A[3]                      # P + P
    B[4] = curve.neg(A[4])           # P + (-P) -> infinity

    def lift(pts):
        fe = ctx.fe
        xs = F.Fe(jnp.asarray(F.to_mont_cols(fe, [p[0] for p in pts])),
                  fe.p, 4096)
        ys = F.Fe(jnp.asarray(F.to_mont_cols(fe, [p[1] for p in pts])),
                  fe.p, 4096)
        return E.Pt(xs, ys, F.fe_const(fe, ctx.r_mod_p, len(pts))), xs, ys

    PA, _, _ = lift(A)
    PB, bx, by = lift(B)
    want = [curve.add(a, b) for a, b in zip(A, B)]
    assert E.pt_from_device(curve, E.ec_add(ctx, PA, PB)) == want
    assert E.pt_from_device(curve, E.ec_madd(ctx, PA, bx, by)) == want
    idp = E.identity(ctx, len(B))
    assert E.pt_from_device(curve, E.ec_madd(ctx, idp, bx, by)) == B
    assert E.pt_from_device(curve, E.ec_add(ctx, PA, idp)) == A


def test_signed_digits_reconstruct():
    order = PALLAS.order
    r = random.Random(5)
    scalars = [0, 1, order - 1] + [r.randrange(order) for _ in range(29)]
    buckets, negidx = signed_digits(scalars, order, 16)
    for j, s in enumerate(scalars):
        v = 0
        for w in range(16):
            d = int(buckets[w, j])
            if negidx[w, j] & 1:
                d = -d
            v += d << (16 * w)
        assert v % order == s % order


@pytest.mark.parametrize("c_bits", [8, 12])
@pytest.mark.parametrize("case", ["random", "skewed", "equal", "single"])
def test_msm_v2_matches_host(case, c_bits):
    """End-to-end device kernel vs Curve.pippenger on the 8- and
    12-bit window configurations (small shapes compile quickly on the
    CPU mesh); the 16-bit TPU configuration differs only in table
    geometry."""
    curve = PALLAS
    n = 128
    r = random.Random(7)
    pts = _points(curve, n)
    if case == "random":
        scalars = [r.randrange(curve.order) for _ in range(n)]
    elif case == "skewed":
        scalars = [0] * 50 + [1] * 30 + [2] * 20 + \
            [r.randrange(curve.order) for _ in range(28)]
    elif case == "equal":
        scalars = [curve.order - 2] * n
    else:
        scalars = [0] * (n - 1) + [9]
    tab = MsmTable.build(curve, pts)
    got = tab.msm(scalars, lanes_w=8, c_bits=c_bits)
    assert got == curve.pippenger(list(scalars), pts)


@pytest.mark.parametrize("c_bits", [8, 12, 16])
def test_device_digitizer_matches_host(c_bits):
    """Device-side digitizer vs the host oracle, incl. the unsigned
    top window (Pallas' order has the 2^254 bit set — a signed fold of
    the top digit would need a 17th window)."""
    import jax
    from lurk_tpu.msm.device_v2 import _device_digits, pack_scalar_words
    order = PALLAS.order
    r = random.Random(5)
    scalars = [0, 1, order - 1, order - 2, (1 << 254) + 3] + \
        [r.randrange(order) for _ in range(27)]
    want_b, want_n = signed_digits(scalars, order, c_bits)
    words = pack_scalar_words(scalars, order)
    got_b, got_n = jax.jit(
        lambda w: _device_digits(w, c_bits))(jnp.asarray(words))
    assert np.array_equal(np.asarray(got_b), want_b)
    assert np.array_equal(np.asarray(got_n), want_n)
