"""Pallas TPU Poseidon kernel, 6th generation: 12-bit-limb carry-free
int8 nibble core (ops.nib12 — see its docstring for why 12-bit limbs
beat 16-bit ones on the VPU-bound S-box path).

Structure mirrors pallas_nib (fused MDS+REDC-head int8 matmuls,
unnormalized Montgomery m, exact f32 carry-out), with:

  - squares/products accumulated EXACTLY in uint32 (no lo/hi split);
  - normalize = three parallel passes, no Kogge-Stone;
  - state between rounds as base-2^12 columns, TWO carry passes before
    nibble-plane extraction (4 planes/column -> MDS contraction
    t*88 = 440);
  - input stays uint32[arity, 16, B] canonical 16-bit limbs and output
    uint32[16, B]: the load matmul's Toeplitz in-weights are the 16-bit
    plane layout, and the digest is converted 12->16-bit limbs by one
    0/1 selection matmul (weights are 4-bit aligned on both sides).

Round schedule, constants, domain tag: Neptune parity via spec.py
(functionality of /root/reference/src/hash.rs:86-114 through the
external neptune crate). Digest oracle: poseidon.host.hash_preimage.
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
from .spec import poseidon_spec

DEFAULT_TILE = 2048

L = N12.L                  # 22
BINS = N12.BINS            # 66
STATE_COL_BITS = 15        # state columns after one carry pass (4 planes)
SQ_COL_BITS = N12.SQ_COL_BITS   # 18 (after prep_product's one pass)
IN_COL_BITS_16 = 16        # canonical 16-bit limb inputs


def _redc_rows_for(nf: N12.Nib12Field, constant: int,
                   in_weights) -> np.ndarray:
    """[3*BINS, K] int8: rows [m(66, bin-major, === x*const*N' mod R) |
    T_hi(66, s-major @264) | T_lo(66, bin-major)] for T = x*const."""
    c_m = constant * nf.nprime
    m_rows = NB.toeplitz_nib(c_m, in_weights, NB.bin_weights(BINS))
    hi_rows = NB.toeplitz_nib(constant, in_weights,
                              N12.smajor_weights(L, N12.R_BITS))
    lo_rows = NB.toeplitz_nib(constant, in_weights, NB.bin_weights(BINS))
    return np.concatenate([m_rows, hi_rows, lo_rows], axis=0)


@lru_cache(maxsize=None)
def _constants(field: FieldSpec, arity: int):
    spec = poseidon_spec(field, arity)
    nf = N12.nib12_field(field)
    t = spec.width
    n_rounds = spec.full_rounds + spec.partial_rounds

    # [nr, t, L, 1]: per-element blocks (the kernel state is a tuple of
    # per-element arrays, so constants are indexed [round, element])
    rc = np.zeros((n_rounds, t, L, 1), dtype=np.uint32)
    for r in range(n_rounds):
        for j in range(t):
            v = nf.to_mont_int(int(spec.round_constants[r * t + j]))
            rc[r, j, :, 0] = N12._int_to_limbs(v)

    # fused MDS+REDC-head matrix over 4-plane state columns
    in_w_el = N12.plane_weights(L, -(-STATE_COL_BITS // 4))
    ppe = len(in_w_el)                                  # 88
    mds = np.zeros((t * 3 * BINS, t * ppe), dtype=np.int8)
    for j in range(t):
        for i in range(t):
            cij = nf.to_mont_int(int(spec.mds[i][j]))
            mds[j * 3 * BINS:(j + 1) * 3 * BINS,
                i * ppe:(i + 1) * ppe] = _redc_rows_for(nf, cij, in_w_el)

    sq_mats = N12.redc_mats_host(nf, SQ_COL_BITS)

    # load: x (canonical SIXTEEN-bit limb planes) * R^2 -> Montgomery
    in_w_load = NB.plane_weights(16, 4)
    load_mat = _redc_rows_for(nf, nf.r2, in_w_load)     # [198, 64]

    # final from_mont REDC (T = exact 12-bit limbs)
    fin_mats = N12.redc_mats_host(nf, N12.LIMB_BITS)

    tag = N12._int_to_limbs(nf.to_mont_int(spec.domain_tag))

    # f32 weights of bin-major T_lo bins in the carry-out (clamped)
    binw = np.zeros((BINS, 1), dtype=np.float32)
    for r in range(BINS):
        e = 4 * r - N12.R_BITS
        if e >= -40:
            binw[r, 0] = np.float32(2.0 ** e)

    # digest conversion: 12-bit nibble planes -> 16-bit limb s-major
    conv = NB.toeplitz_nib(1, N12.plane_weights(L, 3),
                           NB.smajor_weights(16, 0))    # [64, 66]

    return (spec, nf, rc, mds, sq_mats, load_mat, fin_mats, tag, binw,
            conv)


def _assemble_redc_out(rows_i32, phi, u_col, binw_col, n_passes: int):
    """REDC tail for a fused [3*BINS, B] matmul output block ->
    [L, B] uint32 base-2^12 columns (value < ~9p)."""
    m_bins = rows_i32[:BINS].astype(jnp.uint32)
    m_bins = NB.bins_carry_pass(m_bins, n_passes)
    t_hi = N12.merge_smajor(rows_i32[BINS:2 * BINS].astype(jnp.uint32))
    t_lo = rows_i32[2 * BINS:3 * BINS]
    tl_f = t_lo.astype(jnp.float32) * binw_col
    c = N12.carry_out_f32(tl_f, m_bins, u_col)
    mp = NB.int8_matmul(phi, m_bins.astype(jnp.int32).astype(jnp.int8))
    out = N12.merge_smajor(mp.astype(jnp.uint32)) + t_hi
    return jnp.concatenate([out[:1] + c, out[1:]], axis=0)


def build_pallas_nib12_hasher(field: FieldSpec, arity: int,
                              tile: int = DEFAULT_TILE,
                              vmem_limit: int | None = None):
    """hash(preimages: uint32[arity, 16, B]) -> uint32[16, B] canonical.
    B a multiple of `tile`. Drop-in for the other build_*_hasher's."""
    (spec, nf, rc_np, mds_np, sq_mats, load_np, fin_mats, tag, binw_np,
     conv_np) = _constants(field, arity)
    t = spec.width
    half = spec.full_rounds // 2
    rp = spec.partial_rounds
    # exact m-row digit sums over every output element's m block
    mds_passes = max(
        N12.m_passes_for(mds_np[j * 3 * BINS:j * 3 * BINS + BINS])
        for j in range(t))
    load_passes = N12.m_passes_for(load_np[:BINS])
    sq_m_mat, sq_phi, sq_w, sq_u, sq_passes = sq_mats
    fin_m_mat, _, fin_w, _, fin_passes = fin_mats

    def kernel(rc_ref, mds_ref, sqm_ref, phi_ref, sqw_ref, u_ref,
               binw_ref, load_ref, finm_ref, finw_ref, conv_ref,
               in_ref, out_ref):
        bt = in_ref.shape[-1]
        phi = phi_ref[...]
        u_col = u_ref[...]
        binw = binw_ref[...]
        sq_redc = (sqm_ref[...], phi, sqw_ref[...], u_col, sq_passes)

        def sbox(u_cols):
            # every sbox input here has cols < 2^26.1 (REDC outputs are
            # < 2^25.2 and MDS outputs + rc < 2^26.01), so two passes
            # bound limbs by 4100 — squares stay uint32-exact
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

        def mds_layer(els: List):
            # ONE pass per element: cols < 2^26.1 -> <= 4095 + 2^14.1
            # < 2^15, which still fits the 4 nibble planes the MDS
            # matrix contracts over (STATE_COL_BITS 13 and 15 both take
            # ceil(bits/4) = 4 planes). Per-element (offset-0 arrays)
            # rather than one concatenated pass: slicing a [t*L, B]
            # concat back into elements puts each slice at a different
            # sublane offset, which sends Mosaic layout assignment
            # pathological.
            els = [N12.limbs_carry_pass(e, 1) for e in els]
            planes = jnp.concatenate(
                [N12.cols_to_planes(e, STATE_COL_BITS) for e in els],
                axis=0)
            rows = NB.int8_matmul(mds_ref[...], planes)   # [t*198, B]
            return [
                _assemble_redc_out(rows[j * 3 * BINS:(j + 1) * 3 * BINS],
                                   phi, u_col, binw, mds_passes)
                for j in range(t)]

        # The round state is a TUPLE of t offset-0 [L, B] arrays — never
        # one concatenated [t*L, B] array. unstack()-style slices of a
        # concat sit at distinct sublane offsets (L % 8 != 0), and every
        # downstream op then pays a Mosaic relayout (or worse, sends
        # layout assignment pathological). Tuple state also lets a full
        # round run ONE wide S-box over the lane-concatenated elements
        # (legal: all inputs offset {0,0}), so its 3 REDCs are single
        # [*, t*B] matmuls instead of t small ones.

        def full_round(r, els):
            els = [e + rc_ref[r, i] for i, e in enumerate(els)]
            y = sbox(jnp.concatenate(els, axis=1))        # [L, t*B]
            return tuple(mds_layer(
                [y[:, i * bt:(i + 1) * bt] for i in range(t)]))

        def partial_round(r, els):
            els = [e + rc_ref[r, i] for i, e in enumerate(els)]
            els[0] = sbox(els[0])
            return tuple(mds_layer(els))

        # ---- load (16-bit limb planes) + to-Montgomery ----
        els = []
        for a in range(arity):
            planes = NB.cols_to_planes(in_ref[a], IN_COL_BITS_16)
            rows = NB.int8_matmul(load_ref[...], planes)
            els.append(_assemble_redc_out(rows, phi, u_col, binw,
                                          load_passes))
        tag_cols = jnp.concatenate(
            [jnp.full((1, bt), int(tag[k]), dtype=jnp.uint32)
             for k in range(L)], axis=0)
        st = (tag_cols, *els)

        st = jax.lax.fori_loop(0, half, full_round, st)
        st = jax.lax.fori_loop(half, half + rp, partial_round, st)
        st = jax.lax.fori_loop(half + rp, half + rp + half, full_round,
                               st)

        # ---- digest: from_mont(state[1]) + canonicalize + 12->16 ----
        s1n = N12.normalize_exact(st[1])
        fin_redc = (finm_ref[...], phi, finw_ref[...], u_col, fin_passes)
        d = N12.redc_cols(fin_redc, s1n, N12.LIMB_BITS)
        dn = N12.normalize_exact(d)
        for k_mult in (8, 4, 2, 1, 1):
            dn = N12.cond_sub_const(dn, N12._int_to_limbs(
                k_mult * nf.modulus))
        planes = N12.cols_to_planes(dn, N12.LIMB_BITS)    # [66, B]
        rows16 = NB.int8_matmul(conv_ref[...], planes)    # [64, B]
        out_ref[...] = NB.merge_smajor(rows16.astype(jnp.uint32),
                                       n_limbs=16)

    rc_dev = jnp.asarray(rc_np)
    mds_dev = jnp.asarray(mds_np)
    sqm_dev = jnp.asarray(sq_m_mat)
    phi_dev = jnp.asarray(nf.p_hi_mat)
    sqw_dev = jnp.asarray(sq_w)
    u_dev = jnp.asarray(sq_u)
    binw_dev = jnp.asarray(binw_np)
    load_dev = jnp.asarray(load_np)
    finm_dev = jnp.asarray(fin_m_mat)
    finw_dev = jnp.asarray(fin_w)
    conv_dev = jnp.asarray(conv_np)

    def _whole(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    compiler_params = None
    if vmem_limit is not None:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)

    def hasher(preimages):
        b = preimages.shape[-1]
        assert b % tile == 0, f"batch {b} not a multiple of {tile}"
        grid = (b // tile,)
        consts = [rc_dev, mds_dev, sqm_dev, phi_dev, sqw_dev, u_dev,
                  binw_dev, load_dev, finm_dev, finw_dev, conv_dev]
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
def _hash_jit(field: FieldSpec, arity: int, tile: int, preimages):
    # raised vmem scope: the arity-8 hasher's scoped allocation is
    # ~41 MB at tile 2048 (Mosaic's 16 MB default rejects it)
    return build_pallas_nib12_hasher(field, arity, tile,
                                     vmem_limit=100 << 20)(preimages)


def hash_batch_pallas_nib12(field: FieldSpec, arity: int, preimages_ints,
                            tile: int = DEFAULT_TILE) -> list:
    """Host API mirroring kernel.hash_batch (ints in, digests out)."""
    n = len(preimages_ints)
    size = tile
    while size < n:
        size += tile
    arr = np.zeros((arity, 16, size), dtype=np.uint32)
    for j, pre in enumerate(preimages_ints):
        for a, v in enumerate(pre):
            arr[a, :, j] = NB._int_to_limbs(v % field.modulus, 16)
    out = np.asarray(_hash_jit(field, arity, tile, jnp.asarray(arr)))
    res = []
    for j in range(n):
        v = 0
        for i in range(15, -1, -1):
            v = (v << 16) | int(out[i, j])
        res.append(v)
    return res
