"""Pippenger multi-scalar multiplication on TPU.

Replaces arecibo's CPU/CUDA Pippenger (external crate; the dominant
kernel of Nova folding commitments, see SURVEY.md §2.4) with an
XLA-native, branchless formulation built on complete EC addition:

  per window w (lax.scan over windows):
    1. sort points by their c-bit digit (one argsort + gather);
    2. inclusive prefix scan of EC adds over the sorted batch
       (Hillis-Steele at fixed width: ONE traced EC add run log2(N)
       times under fori_loop — compile-friendly);
    3. bucket sums as prefix differences: B_d = P[last(d)] - P[last(d-1)]
       (EC points form a group, so range sums are prefix differences —
       no scatter/atomics anywhere);
    4. weighted reduction sum_d d*B_d: bit-masked bucket copies stacked
       on a batch axis, one fixed-width pairwise tree (fori_loop), then
       a Horner ladder over bits.
  final: Horner over windows with c doublings per step (fori_loop).

Every EC-add body is traced once and reused across loop iterations, so
the compiled program is small regardless of N.

Multi-chip scaling: shard the point batch across devices and combine the
per-shard window sums (see lurk_tpu.parallel.sharding.shard_msm).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.device import (
    JPoint, ec_add, ec_neg, ec_select, identity, points_from_device,
    points_to_device,
)
from ..curves.weierstrass import Affine, Curve

DEFAULT_WINDOW = 8  # c bits per window


def _digits(scalars: Sequence[int], c: int, n_windows: int) -> np.ndarray:
    """[n_windows, N] uint32 digit matrix."""
    out = np.zeros((n_windows, len(scalars)), dtype=np.uint32)
    mask = (1 << c) - 1
    for j, s in enumerate(scalars):
        for w in range(n_windows):
            out[w, j] = (s >> (c * w)) & mask
    return out


def _take(pts: JPoint, idx) -> JPoint:
    return JPoint(pts.x[..., idx], pts.y[..., idx], pts.z[..., idx])


def _prefix_scan(curve: Curve, pts: JPoint) -> JPoint:
    """Inclusive EC prefix scan, Hillis-Steele at fixed width."""
    n = pts.x.shape[-1]
    n_steps = max(1, int(np.ceil(np.log2(max(n, 2)))))
    ident = identity(curve, n)
    pos = jnp.arange(n, dtype=jnp.int32)

    def body(k, x):
        s = jnp.int32(1) << k
        shifted = JPoint(jnp.roll(x.x, s, axis=-1),
                         jnp.roll(x.y, s, axis=-1),
                         jnp.roll(x.z, s, axis=-1))
        mask = (pos >= s)[None, :]
        shifted = ec_select(mask, shifted, ident)
        return ec_add(curve, x, shifted)

    return jax.lax.fori_loop(0, n_steps, body, pts)


def _tree_sum(curve: Curve, pts: JPoint) -> JPoint:
    """Sum a power-of-two batch to one point at fixed width: each level
    adds even/odd pairs into the front half, pads with identity."""
    n = pts.x.shape[-1]
    assert n & (n - 1) == 0, "tree sum needs a power of two"
    if n == 1:
        return pts
    levels = int(np.log2(n))
    ident = identity(curve, n // 2)

    def body(_, x):
        even = _take(x, slice(0, n, 2))
        odd = _take(x, slice(1, n, 2))
        s = ec_add(curve, even, odd)

        def pad(a, i):
            fill = jnp.broadcast_to(i, a.shape)
            return jnp.concatenate([a, fill], axis=-1)

        return JPoint(pad(s.x, ident.x), pad(s.y, ident.y),
                      pad(s.z, ident.z))

    out = jax.lax.fori_loop(0, levels, body, pts)
    return _take(out, slice(0, 1))


def msm_device(curve: Curve, digits: jnp.ndarray, points: JPoint,
               c: int) -> JPoint:
    """digits: uint32[n_windows, N]; points: JPoint batch of N.
    Returns a single-point JPoint (batch of 1)."""
    n_windows, n = digits.shape
    n_buckets = 1 << c
    ds = jnp.arange(n_buckets, dtype=jnp.uint32)

    def window_sum(carry, wdigits):
        # 1. sort by digit
        order = jnp.argsort(wdigits)
        sd = wdigits[order]
        pts = _take(points, order)
        # 2. inclusive prefix scan of EC adds
        prefix = _prefix_scan(curve, pts)
        # 3. bucket sums as prefix range differences
        r = jnp.searchsorted(sd, ds, side="right").astype(jnp.int32) - 1
        r_prev = jnp.searchsorted(sd, ds - 1, side="right").astype(
            jnp.int32) - 1
        r_prev = jnp.where(ds == 0, -1, r_prev)
        ident_b = identity(curve, n_buckets)

        def gather_prefix(idx):
            g = _take(prefix, jnp.maximum(idx, 0))
            return ec_select((idx >= 0)[None, :], g, ident_b)

        buckets = ec_add(curve, gather_prefix(r),
                         ec_neg(curve, gather_prefix(r_prev)))
        # 4. sum_d d*B_d: stack bit-masked copies [c, ..., n_buckets]
        masked = []
        for j in range(c):
            bit = ((ds >> j) & 1).astype(bool)[None, :]
            masked.append(ec_select(bit, buckets, ident_b))
        stacked = JPoint(
            jnp.stack([m.x for m in masked], axis=0),
            jnp.stack([m.y for m in masked], axis=0),
            jnp.stack([m.z for m in masked], axis=0))
        bit_sums = _tree_sum(curve, stacked)      # [c, .., 1]

        # Horner over bits, top down: acc = 2*acc + S_j
        ident1 = identity(curve, 1)

        def horner_bit(k, acc):
            j = c - 1 - k
            acc = ec_add(curve, acc, acc)
            sj = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, j, axis=0, keepdims=False), bit_sums)
            return ec_add(curve, acc, sj)

        acc_w = jax.lax.fori_loop(0, c, horner_bit, ident1)
        return carry, acc_w

    _, window_sums = jax.lax.scan(window_sum, 0, digits)

    # Horner over windows, top down: acc = 2^c * acc + S_w
    ident1 = identity(curve, 1)

    def horner_window(k, acc):
        w = n_windows - 1 - k

        def dbl(_, a):
            return ec_add(curve, a, a)

        acc = jax.lax.fori_loop(0, c, dbl, acc)
        sw = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(
                a, w, axis=0, keepdims=False), window_sums)
        return ec_add(curve, acc, sw)

    return jax.lax.fori_loop(0, n_windows, horner_window, ident1)


@partial(jax.jit, static_argnums=(0, 3))
def _msm_jit(curve: Curve, digits, points: JPoint, c: int) -> JPoint:
    return msm_device(curve, digits, points, c)


def msm(curve: Curve, scalars: Sequence[int], points: Sequence[Affine],
        c: int = DEFAULT_WINDOW) -> Affine:
    """Host API: MSM over affine points with python-int scalars.

    Inputs are padded to the next power-of-two size bucket (min 64) so
    compiled shapes are shared across nearby sizes."""
    assert len(scalars) == len(points)
    if not scalars:
        return None
    n = len(scalars)
    size = 64
    while size < n:
        size *= 2
    scalars = list(scalars) + [0] * (size - n)
    points = list(points) + [None] * (size - n)
    n_windows = (curve.scalar.num_bits + c - 1) // c
    digits = _digits([s % curve.order for s in scalars], c, n_windows)
    dev_points = points_to_device(curve, list(points))
    out = _msm_jit(curve, jnp.asarray(digits), dev_points, c)
    return points_from_device(curve, out)[0]
