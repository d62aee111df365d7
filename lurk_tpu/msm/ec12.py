"""Complete elliptic-curve point ops on the bound-tracked 12-bit core.

Projective points (X:Y:Z) with coordinates as ``fe12.Fe`` batches in the
Montgomery domain. Formulas are the COMPLETE prime-order a=0 additions
of Renes-Costello-Batina 2015: Algorithm 7 (projective + projective) and
Algorithm 8 (projective + affine, "mixed") — one branchless dataflow
covers add, double, identity and inverse inputs, so the MSM scan needs
no data-dependent control flow (identity handling is a select on the
OUTPUT only, for "no element this lane this step").

The lazy-reduction bounds of fe12 have a fixed point through these
formulas (acc coords stay < ~8p < R/128; verified at import by
``accum_bounds``), so there is no canonicalization anywhere in the hot
loop.

Replaces the reference's pasta_curves/halo2curves + arecibo EC hot loops
(reference Cargo.toml:128,137; SURVEY §2.3). Oracle:
lurk_tpu.curves.weierstrass (python ints).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..curves.weierstrass import Curve
from . import fe12 as F
from .fe12 import Fe, fe12_ctx


class Pt(NamedTuple):
    x: Fe
    y: Fe
    z: Fe


@dataclasses.dataclass(frozen=True)
class EcCtx:
    fe: F.Fe12Ctx
    b3_mont: int          # 3*b in the Montgomery domain
    r_mod_p: int

    @property
    def p(self) -> int:
        return self.fe.p


@lru_cache(maxsize=None)
def ec_ctx(curve: Curve) -> EcCtx:
    fe = fe12_ctx(curve.base)
    b3 = (3 * curve.b % curve.p) * F.R % curve.p
    return EcCtx(fe=fe, b3_mont=b3, r_mod_p=F.R % curve.p)


def identity(ctx: EcCtx, batch: int, dry: bool = False) -> Pt:
    zero = Fe(None if dry else
              jnp.zeros((F.L, batch), dtype=jnp.int32), 1, 1)
    one = F.fe_const(ctx.fe, ctx.r_mod_p, batch, dry)
    return Pt(zero, one, zero)


def pt_select(mask, a: Pt, b: Pt) -> Pt:
    return Pt(F.fe_select(mask, a.x, b.x),
              F.fe_select(mask, a.y, b.y),
              F.fe_select(mask, a.z, b.z))


def ec_add(ctx: EcCtx, p1: Pt, p2: Pt) -> Pt:
    """RCB15 Algorithm 7 (complete, a=0)."""
    fe = ctx.fe
    batch = None if p1.x.cols is None else p1.x.cols.shape[1]
    b3 = F.fe_const(fe, ctx.b3_mont, batch or 1, dry=batch is None)
    mul = lambda a, b: F.fe_mul(fe, a, b)       # noqa: E731
    add = lambda a, b: F.fe_add(fe, a, b)       # noqa: E731
    sub = lambda a, b: F.fe_sub(fe, a, b)       # noqa: E731
    x1, y1, z1 = p1
    x2, y2, z2 = p2

    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t2 = mul(z1, z2)
    t3 = add(x1, y1)
    t4 = add(x2, y2)
    t3 = mul(t3, t4)
    t4 = add(t0, t1)
    t3 = sub(t3, t4)
    t4 = add(y1, z1)
    x3 = add(y2, z2)
    t4 = mul(t4, x3)
    x3 = add(t1, t2)
    t4 = sub(t4, x3)
    x3 = add(x1, z1)
    y3 = add(x2, z2)
    x3 = mul(x3, y3)
    y3 = add(t0, t2)
    y3 = sub(x3, y3)
    x3 = add(t0, t0)
    t0 = add(x3, t0)
    t2 = mul(b3, t2)
    z3 = add(t1, t2)
    t1 = sub(t1, t2)
    y3 = mul(b3, y3)
    x3 = mul(t4, y3)
    t2 = mul(t3, t1)
    x3 = sub(t2, x3)
    y3 = mul(y3, t0)
    t1 = mul(t1, z3)
    y3 = add(t1, y3)
    t0 = mul(t0, t3)
    z3 = mul(z3, t4)
    z3 = add(z3, t0)
    return Pt(x3, y3, z3)


def ec_madd(ctx: EcCtx, p1: Pt, x2: Fe, y2: Fe) -> Pt:
    """RCB15 Algorithm 8 (complete mixed, a=0): p1 + (x2, y2, 1).
    The affine operand must be a real point (mask the output to skip)."""
    fe = ctx.fe
    batch = None if p1.x.cols is None else p1.x.cols.shape[1]
    b3 = F.fe_const(fe, ctx.b3_mont, batch or 1, dry=batch is None)
    mul = lambda a, b: F.fe_mul(fe, a, b)       # noqa: E731
    add = lambda a, b: F.fe_add(fe, a, b)       # noqa: E731
    sub = lambda a, b: F.fe_sub(fe, a, b)       # noqa: E731
    x1, y1, z1 = p1

    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t3 = add(x2, y2)
    t4 = add(x1, y1)
    t3 = mul(t3, t4)
    t4 = add(t0, t1)
    t3 = sub(t3, t4)
    t4 = mul(y2, z1)
    t4 = add(t4, y1)
    y3 = mul(x2, z1)
    y3 = add(y3, x1)
    x3 = add(t0, t0)
    t0 = add(x3, t0)
    t2 = mul(b3, z1)
    z3 = add(t1, t2)
    t1 = sub(t1, t2)
    y3 = mul(b3, y3)
    x3 = mul(t4, y3)
    t2 = mul(t3, t1)
    x3 = sub(t2, x3)
    y3 = mul(y3, t0)
    t1 = mul(t1, z3)
    y3 = add(t1, y3)
    t0 = mul(t0, t3)
    z3 = mul(z3, t4)
    z3 = add(z3, t0)
    return Pt(x3, y3, z3)


def _bounds(pt: Pt) -> Tuple[Tuple[int, int], ...]:
    return tuple((c.vmax, c.cmax) for c in pt)


@lru_cache(maxsize=None)
def accum_bounds(curve: Curve) -> Tuple[Tuple[int, int], ...]:
    """Fixed-point (vmax, cmax) invariant for loop-carried accumulator
    coords: bounds B such that both complete formulas applied to
    B-bounded inputs (and canonical affine operands) stay within B.
    Computed by dry-running the formulas (no arrays) to a fixed point;
    raises if the bounds diverge past R (they stabilize < ~8p)."""
    ctx = ec_ctx(curve)
    p = ctx.p
    inv = [(p, 4096)] * 3
    canon = Fe(None, p, 4096)
    for _ in range(32):
        acc = Pt(*(Fe(None, v, c) for v, c in inv))
        out_m = ec_madd(ctx, acc, canon, canon)
        out_a = ec_add(ctx, acc, acc)
        new = [(max(m.vmax, a.vmax, v), max(m.cmax, a.cmax, c))
               for (m, a, (v, c)) in zip(out_m, out_a, inv)]
        if new == inv:
            return tuple(inv)
        inv = new
        assert max(v for v, _ in inv) < F.R, "EC bounds diverged"
    raise AssertionError("EC accumulator bounds did not stabilize")


def assume_pt(curve: Curve, x, y, z) -> Pt:
    """Wrap raw carried arrays with the invariant bounds."""
    bnds = accum_bounds(curve)
    return Pt(*(Fe(a, v, c) for a, (v, c) in zip((x, y, z), bnds)))


# ---------------------------------------------------------------------------
# host conversions
# ---------------------------------------------------------------------------


def points_to_cols(curve: Curve, points) -> np.ndarray:
    """Affine host points -> [n, 3*L] uint32 rows (x, y, -y) in the
    Montgomery domain (gather-friendly row layout; None -> zeros, must
    be masked by the caller)."""
    ctx = ec_ctx(curve)
    p = ctx.p
    xs, ys, yn = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0), ys.append(0), yn.append(0)
        else:
            xs.append(pt[0]), ys.append(pt[1]), yn.append((-pt[1]) % p)
    fx = F.to_mont_cols(ctx.fe, xs)      # [L, n]
    fy = F.to_mont_cols(ctx.fe, ys)
    fn = F.to_mont_cols(ctx.fe, yn)
    return np.concatenate([fx.T, fy.T, fn.T], axis=1).copy()


def pt_from_device(curve: Curve, pt: Pt) -> list:
    """Pt batch -> affine host points (or None)."""
    ctx = ec_ctx(curve)
    xs = F.from_device(ctx.fe, pt.x)
    ys = F.from_device(ctx.fe, pt.y)
    zs = F.from_device(ctx.fe, pt.z)
    p = ctx.p
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, p - 2, p)
            out.append((x * zi % p, y * zi % p))
    return out
