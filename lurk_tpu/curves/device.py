"""Device (jnp) elliptic-curve point operations over limb arrays.

Points are projective (X:Y:Z) with coordinates as Montgomery-form limb
arrays ``uint32[..., N_LIMBS, B]`` (see :mod:`lurk_tpu.ops.limbs`); the
batch axis rides the TPU vector lanes. Addition uses the COMPLETE
formulas of Renes-Costello-Batina 2015 (Algorithm 7, a=0): one branchless
formula covers add, double, identity and inverse inputs — no
data-dependent control flow, exactly what XLA wants.

Replaces the reference's pasta_curves/arecibo EC hot loops (external
crates; reference Cargo.toml:128,137).
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import limbs as L
from .weierstrass import Curve


class JPoint(NamedTuple):
    """Projective point batch; coords in Montgomery form."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


@lru_cache(maxsize=None)
def curve_ctx(curve: Curve):
    """(LimbField of base field, b3 constant in Montgomery form)."""
    f = L.limb_field(curve.base)
    b3 = L.mont_constant(f, 3 * curve.b % curve.p)
    return f, b3


def identity(curve: Curve, batch: int) -> JPoint:
    f, _ = curve_ctx(curve)
    zeros = np.zeros((L.N_LIMBS, batch), dtype=np.uint32)
    one = np.broadcast_to(L.mont_constant(f, 1), (L.N_LIMBS, batch))
    return JPoint(jnp.asarray(zeros), jnp.asarray(one.copy()),
                  jnp.asarray(zeros))


def ec_add(curve: Curve, p1: JPoint, p2: JPoint) -> JPoint:
    """Complete projective addition (RCB15 Alg 7 for a=0)."""
    f, b3_np = curve_ctx(curve)
    b3 = jnp.asarray(b3_np)
    mul = lambda a, b: L.mont_mul_arr(f, a, b)  # noqa: E731
    add = lambda a, b: L.add_arr(f, a, b)       # noqa: E731
    sub = lambda a, b: L.sub_arr(f, a, b)       # noqa: E731
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
    return JPoint(x3, y3, z3)


def ec_neg(curve: Curve, p: JPoint) -> JPoint:
    f, _ = curve_ctx(curve)
    return JPoint(p.x, L.neg_arr(f, p.y), p.z)


def ec_select(mask, a: JPoint, b: JPoint) -> JPoint:
    """mask ? a : b, broadcasting mask [..., 1, B] over limbs."""
    return JPoint(jnp.where(mask, a.x, b.x),
                  jnp.where(mask, a.y, b.y),
                  jnp.where(mask, a.z, b.z))


# -- host <-> device conversion ------------------------------------------------


def points_to_device(curve: Curve, points) -> JPoint:
    """Affine host points [(x, y) or None] -> Montgomery projective batch."""
    f, _ = curve_ctx(curve)
    n = len(points)
    xs = np.zeros((L.N_LIMBS, n), dtype=np.uint32)
    ys = np.zeros((L.N_LIMBS, n), dtype=np.uint32)
    zs = np.zeros((L.N_LIMBS, n), dtype=np.uint32)
    r = 1 << L.R_BITS
    p = curve.p
    for j, pt in enumerate(points):
        if pt is None:
            ys[:, j] = L._int_to_limbs(r % p)
        else:
            xs[:, j] = L._int_to_limbs(pt[0] * r % p)
            ys[:, j] = L._int_to_limbs(pt[1] * r % p)
            zs[:, j] = L._int_to_limbs(r % p)
    return JPoint(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs))


def points_from_device(curve: Curve, pts: JPoint):
    """Montgomery projective batch -> list of affine host points."""
    f, _ = curve_ctx(curve)
    xs = L.from_mont(f, pts.x)
    ys = L.from_mont(f, pts.y)
    zs = L.from_mont(f, pts.z)
    xi = f.to_ints(np.asarray(xs).reshape(1, L.N_LIMBS, -1))
    yi = f.to_ints(np.asarray(ys).reshape(1, L.N_LIMBS, -1))
    zi = f.to_ints(np.asarray(zs).reshape(1, L.N_LIMBS, -1))
    p = curve.p
    out = []
    for x, y, z in zip(xi, yi, zi):
        if z == 0:
            out.append(None)
        else:
            zinv = pow(z, p - 2, p)
            out.append((x * zinv % p, y * zinv % p))
    return out
