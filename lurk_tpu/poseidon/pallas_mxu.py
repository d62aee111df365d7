"""Pallas TPU Poseidon kernel: VMEM-resident state + MXU constant matmuls.

Third-generation device kernel, combining the two prior designs:

  - pallas_kernel.py keeps state in VMEM across all rounds (no HBM
    round-trips) but does every multiply on the VPU with the stacked
    16x16-bit core — VPU-bound at ~240k Poseidon-4/s.
  - mxu_kernel.py moves all constant multiplies (MDS matvec, both
    Montgomery-reduction products) onto the MXU via 8-bit digit-plane
    Toeplitz matmuls (lurk_tpu.ops.limbs17), but runs as a plain XLA
    fori_loop whose [L, t, B] carries round-trip HBM every round —
    memory-bound at ~144k/s.

  This kernel does both: grid over batch tiles, per-tile state lives in
  VMEM as 17 x t [tile]-vector registers, rounds run in fori_loops, and
  every constant multiply is a 2D bf16 matmul (f32 accumulation, exact
  by construction — see limbs17 docstring for the lazy-reduction and
  exactness bounds, reused verbatim here).

  Layout trick for Mosaic (which rejects data-moving reshapes and >2D
  dot_general): elements are kept as separate per-limb [tile] registers;
  the fused MDS matmul input is built by CONCATENATING the t per-element
  [D, tile] digit-plane stacks along axis 0 (element-major rows), and the
  constant matrix is the matching [t*2*(2L), t*D] block matrix
  (MDS tensor Toeplitz) so one dot_general mixes elements and digit
  planes at once.

Bit-exactness pinned against the host oracle (Neptune-parity digests,
functionality of /root/reference/src/hash.rs:86-114 via the external
neptune crate).
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
from ..ops import limbs17 as LZ
from .spec import PoseidonSpec, poseidon_spec

DEFAULT_TILE = 512


@lru_cache(maxsize=None)
def _pallas_mxu_constants(field: FieldSpec, arity: int):
    """(spec, lazy field, rc[n_rounds, t*L] mont, fused MDS block mats +
    element-chunk bounds, tag limbs)."""
    spec = poseidon_spec(field, arity)
    f = LZ.lazy_field(field)
    t = spec.width
    n_rounds = spec.full_rounds + spec.partial_rounds
    rc = np.asarray(spec.round_constants, dtype=object).reshape(n_rounds, t)
    rc_arr = np.zeros((n_rounds, t * LZ.L), dtype=np.uint32)
    for r in range(n_rounds):
        for j in range(t):
            rc_arr[r, j * LZ.L:(j + 1) * LZ.L] = \
                LZ._int_to_limbs17(f.to_mont_int(int(rc[r][j])))
    # fused MDS: rows (j, r) element-major over output elements, cols
    # (i, c) element-major over input elements; block (j, i) is the
    # [2*(2L), D] Toeplitz plane matrix of mds_mont[i][j] (spec
    # orientation: out[j] = sum_i M[i][j] x[i]). Chunked over input
    # elements so one matmul contracts <= 257 digit terms (f32-exact).
    rows_per_el = 2 * (2 * LZ.L)
    max_els = LZ.MAX_MATMUL_TERMS // LZ.D          # 7
    bounds = []
    s = 0
    while s < t:
        e = min(s + max_els, t)
        bounds.append((s, e))
        s = e
    mats = []
    for (s, e) in bounds:
        m = np.zeros((t * rows_per_el, (e - s) * LZ.D), dtype=np.float32)
        for i in range(s, e):
            for j in range(t):
                blk = _toeplitz_block(f.to_mont_int(int(spec.mds[i][j])))
                m[j * rows_per_el:(j + 1) * rows_per_el,
                  (i - s) * LZ.D:(i - s + 1) * LZ.D] = blk
        mats.append(m)
    tag_limbs = LZ._int_to_limbs17(f.to_mont_int(spec.domain_tag))
    return spec, f, rc_arr, mats, bounds, tag_limbs


def _toeplitz_block(constant: int) -> np.ndarray:
    """[2*(2L), D] planes-order digit matrix of `constant` (the full
    34-limb product of a 17-limb input by the constant)."""
    digits = [(constant >> (8 * i)) & 0xFF for i in range(64)]
    rows, cols = 2 * (2 * LZ.L), LZ.D
    m = np.zeros((rows, cols), dtype=np.float32)
    for r in range(rows):
        wr = LZ._plane_weight(r, 2 * LZ.L)
        for c in range(cols):
            wc = LZ._plane_weight(c, LZ.L)
            d = wr - wc
            if 0 <= d < len(digits):
                m[r, c] = digits[d]
    return m


def _sbox_el(f, redc_mats, x: List) -> List:
    """x -> x^5 for one element ([tile] limb registers). Mosaic note:
    lane-concatenating the t elements into [t*tile] registers to share
    one REDC matmul pair per stage fails to lower (1-D tpu.concatenate
    of 512-lane vectors is unsupported), so the S-box stays
    per-element."""
    x2 = LZ.redc(f, LZ.product_cols(x, x), redc_mats)
    x4 = LZ.redc(f, LZ.product_cols(x2, x2), redc_mats)
    return LZ.redc(f, LZ.product_cols(x4, x), redc_mats)


def _mds(f, redc_mats, mats, bounds, state: List[List]) -> List[List]:
    """state: t per-element 17-limb [tile] register lists -> same.
    One fused (element x digit-plane) matmul per element chunk; the
    final REDC runs per element."""
    t = len(state)
    rows_per_el = 2 * (2 * LZ.L)
    acc = None
    for mat, (s, e) in zip(mats, bounds):
        planes = jnp.concatenate(
            [LZ.to_planes_bf16(state[i]) for i in range(s, e)], axis=0)
        out = jax.lax.dot_general(
            mat, planes,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32).astype(jnp.uint32)     # [t*68, tile]
        per_el = []
        for j in range(t):
            blk = out[j * rows_per_el:(j + 1) * rows_per_el]
            cols = LZ.merge_planes(blk, 2 * LZ.L)
            if len(mats) > 1:
                cols = LZ.carry(cols, 2 * LZ.L)
            per_el.append(cols)
        acc = per_el if acc is None else [
            LZ.add_cols(a, b) for a, b in zip(acc, per_el)]
    return [LZ.redc(f, cols, redc_mats) for cols in acc]


def build_pallas_mxu_hasher(field: FieldSpec, arity: int,
                            tile: int = DEFAULT_TILE):
    """hash(preimages: uint32[arity, 16, B]) -> uint32[16, B] (canonical
    domain; B a multiple of tile). Drop-in for kernel.build_hasher."""
    spec, f, rc_np, mats_np, bounds, tag_limbs = \
        _pallas_mxu_constants(field, arity)
    t = spec.width
    half = spec.full_rounds // 2
    rp = spec.partial_rounds
    n_chunks = len(mats_np)

    def kernel(rc_ref, nprime_ref, p_ref, r2_ref, *rest):
        mds_refs = rest[:n_chunks]
        in_ref, out_ref = rest[n_chunks], rest[n_chunks + 1]
        redc_mats = (nprime_ref[...], p_ref[...])
        mats = [m_ref[...] for m_ref in mds_refs]

        def unstack_state(arr):
            return [[arr[e * LZ.L + k] for k in range(LZ.L)]
                    for e in range(t)]

        def stack_state(state):
            return jnp.stack([state[e][k] for e in range(t)
                              for k in range(LZ.L)], axis=0)

        def add_rc(state, r):
            row = rc_ref[r]                        # [t*L] uint32
            out = []
            for e in range(t):
                cols = [state[e][k] + row[e * LZ.L + k]
                        for k in range(LZ.L)]
                out.append(LZ.carry(cols, LZ.L))
            return out

        def full_round(r, st_arr):
            state = unstack_state(st_arr)
            state = add_rc(state, r)
            state = [_sbox_el(f, redc_mats, x) for x in state]
            state = _mds(f, redc_mats, mats, bounds, state)
            return stack_state(state)

        def partial_round(r, st_arr):
            state = unstack_state(st_arr)
            state = add_rc(state, r)
            state[0] = _sbox_el(f, redc_mats, state[0])
            state = _mds(f, redc_mats, mats, bounds, state)
            return stack_state(state)

        # load + to-Montgomery (r2 constant matmul per element)
        bt = in_ref.shape[-1]
        elements = []
        for a in range(arity):
            limbs = [in_ref[a, k] for k in range(16)]
            limbs.append(jnp.zeros((bt,), dtype=jnp.uint32))
            cols = LZ.merge_planes(
                LZ.const_matmul(r2_ref[...], LZ.to_planes_bf16(limbs)),
                2 * LZ.L)
            elements.append(LZ.redc(f, cols, redc_mats))
        tag = [jnp.full((bt,), int(tag_limbs[k]), dtype=jnp.uint32)
               for k in range(LZ.L)]
        st = stack_state([tag] + elements)
        st = jax.lax.fori_loop(0, half, full_round, st)
        st = jax.lax.fori_loop(half, half + rp, partial_round, st)
        st = jax.lax.fori_loop(half + rp, half + rp + half, full_round, st)
        state = unstack_state(st)
        digest = LZ.from_mont(f, state[1], redc_mats)   # [0, p)
        for k in range(16):
            out_ref[k] = digest[k]

    rc_dev = jnp.asarray(rc_np)
    nprime_dev = jnp.asarray(f.nprime_mat, dtype=jnp.bfloat16)
    p_dev = jnp.asarray(f.p_mat, dtype=jnp.bfloat16)
    r2_dev = jnp.asarray(f.r2_mat, dtype=jnp.bfloat16)
    mds_dev = [jnp.asarray(m, dtype=jnp.bfloat16) for m in mats_np]

    def _whole(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    def hasher(preimages):
        b = preimages.shape[-1]
        assert b % tile == 0, f"batch {b} not a multiple of {tile}"
        grid = (b // tile,)
        n_rounds = rc_np.shape[0]
        return pl.pallas_call(
            kernel,
            interpret=jax.default_backend() == "cpu",
            grid=grid,
            in_specs=[
                _whole((n_rounds, t * LZ.L)),
                _whole(nprime_dev.shape),
                _whole(p_dev.shape),
                _whole(r2_dev.shape),
                *[_whole(m.shape) for m in mds_dev],
                pl.BlockSpec((arity, 16, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((16, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, b), jnp.uint32),
        )(rc_dev, nprime_dev, p_dev, r2_dev, *mds_dev, preimages)

    return hasher


@partial(jax.jit, static_argnums=(0, 1, 2))
def _hash_pallas_mxu_jit(field: FieldSpec, arity: int, tile: int,
                         preimages):
    return build_pallas_mxu_hasher(field, arity, tile)(preimages)


def hash_batch_pallas_mxu(field: FieldSpec, arity: int, preimages_ints,
                          tile: int = DEFAULT_TILE) -> list:
    """Host API mirroring kernel.hash_batch via the MXU Pallas path
    (ints in 16-limb layout; batch padded to a multiple of tile)."""
    from ..ops import limbs as L16
    f = L16.limb_field(field)
    n = len(preimages_ints)
    size = tile
    while size < n:
        size += tile
    arr = np.zeros((arity, 16, size), dtype=np.uint32)
    for j, pre in enumerate(preimages_ints):
        cols = f.from_ints(list(pre))
        arr[:, :, j] = cols.T
    out = np.asarray(_hash_pallas_mxu_jit(field, arity, tile,
                                          jnp.asarray(arr)))
    return f.to_ints(out.reshape(1, 16, size))[:n]
