"""Pallas TPU Poseidon kernel, 7th generation: the nib12 core with
OPTIMIZED (sparse) partial rounds.

Same 12-bit carry-free limb arithmetic as pallas_nib12 (see its
docstring), but the round schedule uses poseidon/opt_spec.py's
preprocessing: the rp partial rounds replace the dense fused
MDS+REDC-head matmul ([t*3*BINS, t*88] — ~436k MACs/column) with

  - ONE element-0 contraction over the full state ([3*BINS, t*88]) and
  - a rank-1 update of elements 1..t-1 contracting only element 0's 88
    planes ([(t-1)*3*BINS, 88]),

together ~2.8x fewer MXU MACs on rp of the rf+rp rounds. Constants are
the transported add-after keys (element-0-only inside the chain).
Per-round sparse weights live stacked in VMEM and are indexed by the
loop counter.

Digest parity: bit-exact vs poseidon.host (tests/test_pallas_nib.py
gains an opt variant); spec parity via opt_spec (itself pinned against
the standard path).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import FieldSpec
from ..ops import nib12 as N12
from ..ops import nibbles as NB
from .opt_spec import opt_poseidon_spec
from .pallas_nib12 import (
    DEFAULT_TILE, IN_COL_BITS_16, SQ_COL_BITS, STATE_COL_BITS,
    _assemble_redc_out, _redc_rows_for,
)

L = N12.L
BINS = N12.BINS


@lru_cache(maxsize=None)
def _opt_constants(field: FieldSpec, arity: int):
    o = opt_poseidon_spec(field, arity)
    spec = o.spec
    nf = N12.nib12_field(field)
    t = spec.width
    rp = spec.partial_rounds
    n_rounds = spec.full_rounds + rp
    rf_half = spec.full_rounds // 2

    def limbs(v):
        return N12._int_to_limbs(nf.to_mont_int(int(v) % field.modulus))

    pre = np.zeros((t, L, 1), dtype=np.uint32)
    for i in range(t):
        base = spec.domain_tag if i == 0 else 0   # tag folds into slot 0
        pre[i, :, 0] = limbs((base + o.pre_keys[i]) % field.modulus)
    post = np.zeros((n_rounds, t, L, 1), dtype=np.uint32)
    for r in range(n_rounds):
        for i in range(t):
            post[r, i, :, 0] = limbs(o.post_keys[r][i])

    in_w_el = N12.plane_weights(L, -(-STATE_COL_BITS // 4))
    ppe = len(in_w_el)                                  # 88

    def dense_matrix(mat):
        m = np.zeros((t * 3 * BINS, t * ppe), dtype=np.int8)
        for j in range(t):
            for i in range(t):
                cij = nf.to_mont_int(int(mat[i][j]) % field.modulus)
                m[j * 3 * BINS:(j + 1) * 3 * BINS,
                  i * ppe:(i + 1) * ppe] = _redc_rows_for(
                      nf, cij, in_w_el)
        return m

    # full rounds (except rf_half-1) use the standard MDS; the chain
    # tail (last partial round) uses the dense accumulated matrix.
    # column-convention: state' = M @ state; dense_matrix expects
    # mat[i][j] = coefficient of input i in output j (row-convention),
    # so transpose the column-convention matrices.
    mds_np = dense_matrix([[o.mds_col[i][j] for i in range(t)]
                           for j in range(t)])
    tail_np = dense_matrix([[o.pre_sparse[i][j] for i in range(t)]
                            for j in range(t)])

    # sparse rounds: index 0 = round rf_half-1, 1..rp-1 = partials
    n_sparse = rp
    a_np = np.zeros((n_sparse, 3 * BINS, t * ppe), dtype=np.int8)
    b_np = np.zeros((n_sparse, (t - 1) * 3 * BINS, ppe), dtype=np.int8)
    for k in range(n_sparse):
        sm = o.sparse[k]
        coeffs0 = [sm.m00, *sm.w]          # input i -> output 0
        for i in range(t):
            cij = nf.to_mont_int(int(coeffs0[i]) % field.modulus)
            a_np[k, :, i * ppe:(i + 1) * ppe] = _redc_rows_for(
                nf, cij, in_w_el)
        for j in range(1, t):
            vj = nf.to_mont_int(int(sm.v_hat[j - 1]) % field.modulus)
            b_np[k, (j - 1) * 3 * BINS:j * 3 * BINS, :] = \
                _redc_rows_for(nf, vj, in_w_el)

    # exact m-row passes
    mds_passes = max(
        N12.m_passes_for(mds_np[j * 3 * BINS:j * 3 * BINS + BINS])
        for j in range(t))
    tail_passes = max(
        N12.m_passes_for(tail_np[j * 3 * BINS:j * 3 * BINS + BINS])
        for j in range(t))
    a_passes = max(N12.m_passes_for(a_np[k][:BINS])
                   for k in range(n_sparse))
    b_passes = max(
        N12.m_passes_for(b_np[k][(j - 1) * 3 * BINS:
                                 (j - 1) * 3 * BINS + BINS])
        for k in range(n_sparse) for j in range(1, t))
    sp_passes = max(a_passes, b_passes)

    sq_mats = N12.redc_mats_host(nf, SQ_COL_BITS)
    in_w_load = NB.plane_weights(16, 4)
    load_np = _redc_rows_for(nf, nf.r2, in_w_load)
    load_passes = N12.m_passes_for(load_np[:BINS])
    fin_mats = N12.redc_mats_host(nf, N12.LIMB_BITS)
    binw = np.zeros((BINS, 1), dtype=np.float32)
    for r in range(BINS):
        e = 4 * r - N12.R_BITS
        if e >= -40:
            binw[r, 0] = np.float32(2.0 ** e)
    conv = NB.toeplitz_nib(1, N12.plane_weights(L, 3),
                           NB.smajor_weights(16, 0))

    return (spec, nf, pre, post, mds_np, tail_np, a_np, b_np,
            mds_passes, tail_passes, sp_passes, sq_mats, load_np,
            load_passes, fin_mats, binw, conv, rf_half, rp)


def build_pallas_nib12_opt_hasher(field: FieldSpec, arity: int,
                                  tile: int = DEFAULT_TILE,
                                  vmem_limit: int | None = 100 << 20):
    """hash(preimages: uint32[arity, 16, B]) -> uint32[16, B]."""
    (spec, nf, pre_np, post_np, mds_np, tail_np, a_np, b_np,
     mds_passes, tail_passes, sp_passes, sq_mats, load_np,
     load_passes, fin_mats, binw_np, conv_np, rf_half, rp) = \
        _opt_constants(field, arity)
    t = spec.width
    n_rounds = spec.full_rounds + rp
    sq_m_mat, sq_phi, sq_w, sq_u, sq_passes = sq_mats
    fin_m_mat, _, fin_w, _, fin_passes = fin_mats

    def kernel(pre_ref, post_ref, mds_ref, tail_ref, a_ref, b_ref,
               sqm_ref, phi_ref, sqw_ref, u_ref, binw_ref, load_ref,
               finm_ref, finw_ref, conv_ref, in_ref, out_ref):
        bt = in_ref.shape[-1]
        phi = phi_ref[...]
        u_col = u_ref[...]
        binw = binw_ref[...]
        sq_redc = (sqm_ref[...], phi, sqw_ref[...], u_col, sq_passes)

        def sbox(u_cols):
            un = N12.normalize(u_cols, 2)
            x2 = N12.redc_cols(
                sq_redc, N12.prep_product(N12.square_cols(un)),
                SQ_COL_BITS)
            x2n = N12.normalize(x2, 2)
            x4 = N12.redc_cols(
                sq_redc, N12.prep_product(N12.square_cols(x2n)),
                SQ_COL_BITS)
            x4n = N12.normalize(x4, 2)
            return N12.redc_cols(
                sq_redc, N12.prep_product(N12.product_cols(x4n, un)),
                SQ_COL_BITS)

        def all_planes(els: List):
            els = [N12.limbs_carry_pass(e, 1) for e in els]
            return els, jnp.concatenate(
                [N12.cols_to_planes(e, STATE_COL_BITS) for e in els],
                axis=0)

        def dense_layer(els, mat, passes):
            _, planes = all_planes(els)
            rows = NB.int8_matmul(mat, planes)
            return [
                _assemble_redc_out(rows[j * 3 * BINS:(j + 1) * 3 * BINS],
                                   phi, u_col, binw, passes)
                for j in range(t)]

        def sparse_layer(els, a_mat, b_mat):
            carried, planes = all_planes(els)
            rows0 = NB.int8_matmul(a_mat, planes)    # [3*BINS, B]
            new0 = _assemble_redc_out(rows0, phi, u_col, binw,
                                      sp_passes)
            rows_u = NB.int8_matmul(b_mat, planes[:planes.shape[0] // t])
            outs = [new0]
            for j in range(1, t):
                upd = _assemble_redc_out(
                    rows_u[(j - 1) * 3 * BINS:j * 3 * BINS],
                    phi, u_col, binw, sp_passes)
                outs.append(carried[j] + upd)
            return outs

        def add_post(els, r):
            return [e + post_ref[r, i] for i, e in enumerate(els)]

        def full_round(r, els, mat, passes):
            y = sbox(jnp.concatenate(els, axis=1))
            els = [y[:, i * bt:(i + 1) * bt] for i in range(t)]
            return add_post(dense_layer(els, mat, passes), r)

        # ---- load + pre_keys ----
        els = []
        for a in range(arity):
            planes = NB.cols_to_planes(in_ref[a], IN_COL_BITS_16)
            rows = NB.int8_matmul(load_ref[...], planes)
            els.append(_assemble_redc_out(rows, phi, u_col, binw,
                                          load_passes))
        tag_cols = jnp.zeros((L, bt), dtype=jnp.uint32)
        st = [tag_cols, *els]
        st = [e + pre_ref[i] for i, e in enumerate(st)]
        st = tuple(st)

        # ---- first-half full rounds 0..rf_half-2 ----
        def fr(r, s):
            return tuple(full_round(r, list(s), mds_ref[...],
                                    mds_passes))
        st = jax.lax.fori_loop(0, rf_half - 1, fr, st)

        # ---- round rf_half-1: full sbox, sparse[0] ----
        y = sbox(jnp.concatenate(list(st), axis=1))
        els = [y[:, i * bt:(i + 1) * bt] for i in range(t)]
        st = tuple(add_post(
            sparse_layer(els, a_ref[0], b_ref[0]), rf_half - 1))

        # ---- partial rounds 0..rp-2: sbox0, sparse[k+1] ----
        def pr(k, s):
            els = list(s)
            els[0] = sbox(els[0])
            out = sparse_layer(els, a_ref[k + 1], b_ref[k + 1])
            return tuple(add_post(out, rf_half + k))
        st = jax.lax.fori_loop(0, rp - 1, pr, st)

        # ---- last partial round: sbox0, dense chain tail ----
        els = list(st)
        els[0] = sbox(els[0])
        st = tuple(add_post(dense_layer(els, tail_ref[...],
                                        tail_passes),
                            rf_half + rp - 1))

        # ---- second-half full rounds ----
        def fr2(r, s):
            return tuple(full_round(r, list(s), mds_ref[...],
                                    mds_passes))
        st = jax.lax.fori_loop(rf_half + rp, n_rounds, fr2, st)

        # ---- digest ----
        s1n = N12.normalize_exact(st[1])
        fin_redc = (finm_ref[...], phi, finw_ref[...], u_col,
                    fin_passes)
        d = N12.redc_cols(fin_redc, s1n, N12.LIMB_BITS)
        dn = N12.normalize_exact(d)
        for k_mult in (8, 4, 2, 1, 1):
            dn = N12.cond_sub_const(dn, N12._int_to_limbs(
                k_mult * nf.modulus))
        planes = N12.cols_to_planes(dn, N12.LIMB_BITS)
        rows16 = NB.int8_matmul(conv_ref[...], planes)
        out_ref[...] = NB.merge_smajor(rows16.astype(jnp.uint32),
                                       n_limbs=16)

    consts = [jnp.asarray(pre_np), jnp.asarray(post_np),
              jnp.asarray(mds_np), jnp.asarray(tail_np),
              jnp.asarray(a_np), jnp.asarray(b_np),
              jnp.asarray(sq_m_mat), jnp.asarray(nf.p_hi_mat),
              jnp.asarray(sq_w), jnp.asarray(sq_u),
              jnp.asarray(binw_np), jnp.asarray(load_np),
              jnp.asarray(fin_m_mat), jnp.asarray(fin_w),
              jnp.asarray(conv_np)]

    def _whole(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    compiler_params = None
    if vmem_limit is not None:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit)

    def hasher(preimages):
        b = preimages.shape[-1]
        assert b % tile == 0, f"batch {b} not a multiple of {tile}"
        grid = (b // tile,)
        return pl.pallas_call(
            kernel,
            interpret=jax.default_backend() == "cpu",
            grid=grid,
            compiler_params=compiler_params,
            in_specs=[
                *[_whole(c.shape) for c in consts],
                pl.BlockSpec((arity, 16, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((16, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, b), jnp.uint32),
        )(*consts, preimages)

    return hasher


@partial(jax.jit, static_argnums=(0, 1, 2))
def _hash_jit_opt(field: FieldSpec, arity: int, tile: int, preimages):
    return build_pallas_nib12_opt_hasher(field, arity, tile)(preimages)


def hash_batch_pallas_nib12_opt(field: FieldSpec, arity: int,
                                preimages_ints,
                                tile: int = DEFAULT_TILE) -> list:
    n = len(preimages_ints)
    size = tile
    while size < n:
        size += tile
    arr = np.zeros((arity, 16, size), dtype=np.uint32)
    for j, pre in enumerate(preimages_ints):
        for a, v in enumerate(pre):
            arr[a, :, j] = NB._int_to_limbs(v % field.modulus, 16)
    out = np.asarray(_hash_jit_opt(field, arity, tile,
                                   jnp.asarray(arr)))
    res = []
    for j in range(n):
        v = 0
        for i in range(15, -1, -1):
            v = (v << 16) | int(out[i, j])
        res.append(v)
    return res
