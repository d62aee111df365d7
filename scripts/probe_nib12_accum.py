"""A/B the product/square accumulation variants in the nib12 core
(the _place_rows zero-pad adds are suspected ~50% waste of the S-box's
column accumulation), plus int8 matmul unit placement (MXU or VPU?).

All variants interleaved in ONE process (tunnel timing drifts between
processes — CLAUDE.md).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lurk_tpu.fields import PALLAS_SCALAR as F
from lurk_tpu.ops import nib12 as N12
from lurk_tpu.ops import nibbles as NB

TILE = 2048
ITERS = 2000
L = N12.L


def run(name, rows, body_fn, extra_consts=(), iters=ITERS):
    def kernel(*refs):
        in_ref, out_ref = refs[len(extra_consts)], refs[len(extra_consts) + 1]
        consts = [r[...] for r in refs[:len(extra_consts)]]

        def body(i, st):
            return body_fn(st, consts)

        out_ref[...] = jax.lax.fori_loop(0, iters, body, in_ref[...])

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 0xFFF, size=(rows, TILE),
                                 dtype=np.uint32))
    consts_dev = [jnp.asarray(c) for c in extra_consts]

    def _whole(shape):
        return pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    f = jax.jit(lambda *a: pl.pallas_call(
        kernel,
        in_specs=[*[_whole(c.shape) for c in consts_dev],
                  _whole(x.shape)],
        out_specs=_whole(x.shape),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
    )(*a))
    xs = [jnp.asarray(rng.integers(0, 0xFFF, size=(rows, TILE),
                                   dtype=np.uint32)) for _ in range(10)]
    f(*consts_dev, x).block_until_ready()
    n_calls = 10
    t0 = time.perf_counter()
    outs = [f(*consts_dev, xs[i]) for i in range(n_calls)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n_calls
    cy = dt / iters * 0.94e9
    print(f"{name:34s} {dt/iters*1e6:8.2f} us/op  {cy:9.0f} cy/op",
          flush=True)
    return dt / iters


# ---- accumulation variants -------------------------------------------------


def product_cols_cur(a, b):
    return N12.product_cols(a, b)


def product_cols_pair(a, b):
    """Merge pairs (i, i+1) before placing: half the zero-pad adds."""
    rows = 2 * L
    b_ = a.shape[1]
    acc = None
    for i in range(0, L, 2):
        p0 = a[i:i + 1] * b
        p1 = a[i + 1:i + 2] * b
        comb = jnp.concatenate(
            [p0[:1], p0[1:] + p1[:-1], p1[-1:]], axis=0)   # [23, B]
        contrib = NB._place_rows(comb, i, rows, b_, a.dtype)
        acc = contrib if acc is None else acc + contrib
    return acc


def product_cols_quad(a, b):
    """Merge quads before placing: quarter the zero-pad adds."""
    rows = 2 * L
    b_ = a.shape[1]
    acc = None
    for i in range(0, 20, 4):
        ps = [a[i + k:i + k + 1] * b for k in range(4)]
        comb = ps[0]
        for k in range(1, 4):
            comb = jnp.concatenate(
                [comb[:k], comb[k:] + ps[k][:-1], ps[k][-1:]], axis=0) \
                if comb.shape[0] == 21 + k else jnp.concatenate(
                [comb[:k], comb[k:] + ps[k][:22 - 0], ], axis=0)
        contrib = NB._place_rows(comb, i, rows, b_, a.dtype)
        acc = contrib if acc is None else acc + contrib
    # remaining i = 20, 21
    p0 = a[20:21] * b
    p1 = a[21:22] * b
    comb = jnp.concatenate([p0[:1], p0[1:] + p1[:-1], p1[-1:]], axis=0)
    acc = acc + NB._place_rows(comb, 20, rows, b_, a.dtype)
    return acc


def _merge_shift(lo, hi, s):
    """lo ([r,B], offset 0) + hi placed at row offset s -> [r+s, B]."""
    r = lo.shape[0]
    return jnp.concatenate(
        [lo[:s], lo[s:] + hi[:r - s], hi[r - s:]], axis=0)


def product_cols_tree(a, b):
    """Log-depth band merge: pairwise combine contributions until one
    [43, B] band remains (no zero rows anywhere)."""
    parts = [a[i:i + 1] * b for i in range(L)]     # each [22, B] at off i
    off = 1
    while len(parts) > 1:
        nxt = []
        for k in range(0, len(parts) - 1, 2):
            nxt.append(_merge_shift(parts[k], parts[k + 1], off))
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
        off *= 2
    out = parts[0]                                  # [43, B]
    b_ = a.shape[1]
    return jnp.concatenate(
        [out, jnp.zeros((2 * L - out.shape[0], b_), out.dtype)], axis=0)


def main():
    import sys
    rng = np.random.default_rng(1)
    b2 = jnp.asarray(rng.integers(0, 0xFFF, size=(L, TILE),
                                  dtype=np.uint32))

    reps = 3
    for _ in range(reps):
        run("product_cols current", L,
            lambda st, c: product_cols_cur(st, c[0])[:L] & 0xFFF,
            extra_consts=(np.asarray(b2),))
        run("product_cols pair-merge", L,
            lambda st, c: product_cols_pair(st, c[0])[:L] & 0xFFF,
            extra_consts=(np.asarray(b2),))
        run("product_cols tree-merge", L,
            lambda st, c: product_cols_tree(st, c[0])[:L] & 0xFFF,
            extra_consts=(np.asarray(b2),))

    # ---- is the int8 matmul on the MXU? ----
    nf12 = N12.nib12_field(F)
    m_mat, phi, w, u, npass = N12.redc_mats_host(nf12, N12.SQ_COL_BITS)
    mm = m_mat  # [66, 110] int8

    def mat_body(st, c):
        planes = N12.cols_to_planes(st, N12.SQ_COL_BITS)
        out = NB.int8_matmul(c[0], planes)
        return out[:L].astype(jnp.uint32) & 0xFFF

    def planes_only(st, c):
        planes = N12.cols_to_planes(st, N12.SQ_COL_BITS)
        return planes[:L].astype(jnp.uint32) & 0xFFF

    for _ in range(reps):
        run("planes+int8_matmul [66x110]", L,
            mat_body, extra_consts=(mm,))
        run("planes only (extract cost)", L, planes_only,
            extra_consts=(mm,))


if __name__ == "__main__":
    main()
