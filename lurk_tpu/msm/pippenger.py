"""Pippenger multi-scalar multiplication on TPU.

Replaces arecibo's CPU/CUDA Pippenger (external crate; the dominant kernel
of Nova folding commitments, see SURVEY.md §2.4) with an XLA-native,
branchless formulation built on complete EC addition:

  per window w (lax.scan):
    1. sort points by their c-bit digit (one argsort + gather);
    2. inclusive prefix scan of EC adds over the sorted batch
       (`lax.associative_scan` — log2(N) vectorized stages);
    3. bucket sums as prefix differences: B_d = P[last(d)] - P[last(d-1)]
       (EC points form a group, so range sums are prefix differences —
       no scatter/atomics anywhere);
    4. weighted reduction sum_d d*B_d via the bit trick:
       sum_j 2^j * (masked tree-sum over buckets with bit j set).
  final: Horner over windows with c doublings per step.

Multi-chip scaling: shard the point batch across devices, run stages 1-4
per shard, and psum/gather the per-shard window sums over ICI (bucket
reduction is tiny compared to the prefix scan).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.device import (
    JPoint, curve_ctx, ec_add, ec_neg, ec_select, identity,
    points_from_device, points_to_device,
)
from ..curves.weierstrass import Affine, Curve
from ..ops import limbs as L

DEFAULT_WINDOW = 8  # c bits per window


def _digits(scalars: Sequence[int], c: int, n_windows: int) -> np.ndarray:
    """[n_windows, N] uint32 digit matrix."""
    out = np.zeros((n_windows, len(scalars)), dtype=np.uint32)
    mask = (1 << c) - 1
    for j, s in enumerate(scalars):
        for w in range(n_windows):
            out[w, j] = (s >> (c * w)) & mask
    return out


def _scan_add(curve: Curve):
    def combine(p1: JPoint, p2: JPoint) -> JPoint:
        return ec_add(curve, p1, p2)
    return combine


def msm_device(curve: Curve, digits: jnp.ndarray, points: JPoint,
               c: int) -> JPoint:
    """digits: uint32[n_windows, N]; points: JPoint batch of N.
    Returns a single-point JPoint (batch of 1)."""
    n_windows = digits.shape[0]
    n = digits.shape[1]
    n_buckets = 1 << c

    def window_sum(carry, wdigits):
        # 1. sort by digit
        order = jnp.argsort(wdigits)
        sd = wdigits[order]
        pts = JPoint(points.x[..., order], points.y[..., order],
                     points.z[..., order])
        # zero-digit points contribute nothing: replace with identity so
        # the prefix trick needs no special case (identity adds are free
        # in the complete formula)
        # 2. inclusive prefix scan of EC adds along the batch axis
        prefix = jax.lax.associative_scan(
            lambda a, b: ec_add(curve, a, b), pts, axis=-1)
        # 3. bucket sums as prefix range differences
        ds = jnp.arange(n_buckets, dtype=jnp.uint32)
        # last index with digit <= d  ==  searchsorted right - 1
        r = jnp.searchsorted(sd, ds, side="right").astype(jnp.int32) - 1
        r_prev = jnp.searchsorted(sd, ds - 1, side="right").astype(
            jnp.int32) - 1  # for d=0: searchsorted(max_uint) handled below
        r_prev = jnp.where(ds == 0, -1, r_prev)
        ident = identity(curve, n_buckets)

        def gather_prefix(idx):
            safe = jnp.maximum(idx, 0)
            g = JPoint(prefix.x[..., safe], prefix.y[..., safe],
                       prefix.z[..., safe])
            mask = (idx >= 0)[None, :]
            return ec_select(mask, g, ident)

        hi = gather_prefix(r)
        lo = gather_prefix(r_prev)
        buckets = ec_add(curve, hi, ec_neg(curve, lo))   # [.., n_buckets]
        # 4. weighted reduction sum_d d * B_d via bit masks + tree sums
        ident1 = identity(curve, n_buckets)
        acc_w = identity(curve, 1)
        for j in range(c):
            bit_mask = ((ds >> j) & 1).astype(bool)[None, :]
            masked = ec_select(bit_mask, buckets, ident1)
            # tree reduction to 1 point
            m = n_buckets
            cur = masked
            while m > 1:
                half = m // 2
                left = JPoint(cur.x[..., :half], cur.y[..., :half],
                              cur.z[..., :half])
                right = JPoint(cur.x[..., half:m], cur.y[..., half:m],
                               cur.z[..., half:m])
                cur = ec_add(curve, left, right)
                m = half
            # acc_w += 2^j * cur  (j doublings applied later is wrong per
            # window; instead double cur j times — j <= c-1, cheap)
            for _ in range(j):
                cur = ec_add(curve, cur, cur)
            acc_w = ec_add(curve, acc_w, cur)
        return carry, acc_w

    _, window_sums = jax.lax.scan(window_sum, 0, digits)
    # Horner over windows: acc = 2^c * acc + S_w, from the top window down
    acc = identity(curve, 1)
    for w in range(n_windows - 1, -1, -1):
        for _ in range(c):
            acc = ec_add(curve, acc, acc)
        sw = jax.tree_util.tree_map(lambda a: a[w], window_sums)
        acc = ec_add(curve, acc, sw)
    return acc


@partial(jax.jit, static_argnums=(0, 3))
def _msm_jit(curve: Curve, digits, points: JPoint, c: int) -> JPoint:
    return msm_device(curve, digits, points, c)


def msm(curve: Curve, scalars: Sequence[int], points: Sequence[Affine],
        c: int = DEFAULT_WINDOW) -> Affine:
    """Host API: MSM over affine points with python-int scalars."""
    assert len(scalars) == len(points)
    if not scalars:
        return None
    n_windows = (curve.scalar.num_bits + c - 1) // c
    digits = _digits([s % curve.order for s in scalars], c, n_windows)
    dev_points = points_to_device(curve, list(points))
    out = _msm_jit(curve, jnp.asarray(digits), dev_points, c)
    return points_from_device(curve, out)[0]
