"""Poseidon permutation with MXU-offloaded field arithmetic.

Second-generation device kernel (see lurk_tpu.ops.limbs17): every
constant multiplication — the MDS matvec, both Montgomery-reduction
products, and the to-Montgomery conversion — runs as a constant Toeplitz
matmul over 8-bit digit planes on the MXU (bf16 inputs, f32 accumulation,
exact by construction). Only the S-box variable products (x -> x^2 -> x^4
-> x^5) use VPU 16x16-bit column accumulation. Lazy reduction (R = 2^272)
keeps all values in [0, 3p) with NO conditional subtractions inside the
permutation.

The MDS matvec for all t outputs is ONE fused matmul contracting over
(input element, digit plane) — [2*(2L), t, D, t] x [D, t, B] — followed
by a single vectorized REDC over the whole state.

Replaces the pure-VPU kernels in kernel.py / pallas_kernel.py on the hot
path; bit-exactness is pinned against the host oracle (Neptune digests,
/root/reference/src/hash.rs:86-114 functionality).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FieldSpec
from ..ops import limbs17 as LZ
from .spec import PoseidonSpec, poseidon_spec


@lru_cache(maxsize=None)
def _mxu_constants(field: FieldSpec, arity: int):
    spec = poseidon_spec(field, arity)
    f = LZ.lazy_field(field)
    t = spec.width
    n_rounds = spec.full_rounds + spec.partial_rounds
    # round constants, Montgomery form, [n_rounds, L, t] uint32
    rc = np.asarray(spec.round_constants, dtype=object).reshape(n_rounds, t)
    rc_arr = np.zeros((n_rounds, LZ.L, t), dtype=np.uint32)
    for r in range(n_rounds):
        for j in range(t):
            rc_arr[r, :, j] = LZ._int_to_limbs17(f.to_mont_int(int(rc[r][j])))
    # fused MDS planes matrix [2*(2L), t_out, D, t_in]:
    # out_j = sum_i mds[i][j] * x_i  (spec orientation: result[j] =
    # sum_i M[i][j] state[i]); entry = digit_{w(r)-w(c)}(mds_mont[i][j]).
    # For wide arities the contraction exceeds the f32-exactness budget
    # (257 digit terms), so inputs are chunked over i.
    n_chunks = 1
    while (t // n_chunks + (1 if t % n_chunks else 0)) * LZ.D > \
            LZ.MAX_MATMUL_TERMS:
        n_chunks += 1
    chunk = (t + n_chunks - 1) // n_chunks
    mats = []
    bounds = []
    for s in range(0, t, chunk):
        e = min(s + chunk, t)
        m = np.zeros((2 * (2 * LZ.L), t, LZ.D, e - s), dtype=np.float32)
        for i in range(s, e):
            for j in range(t):
                digits = [(f.to_mont_int(int(spec.mds[i][j])) >> (8 * d))
                          & 0xFF for d in range(64)]
                for rrow in range(2 * (2 * LZ.L)):
                    wr = LZ._plane_weight(rrow, 2 * LZ.L)
                    for ccol in range(LZ.D):
                        wc = LZ._plane_weight(ccol, LZ.L)
                        dd = wr - wc
                        if 0 <= dd < 64:
                            m[rrow, j, ccol, i - s] = digits[dd]
        mats.append(m)
        bounds.append((s, e))
    tag_limbs = LZ._int_to_limbs17(f.to_mont_int(spec.domain_tag))
    return spec, f, rc_arr, mats, bounds, tag_limbs


def _sbox(f: LZ.LazyField, x: List) -> List:
    x2 = LZ.redc(f, LZ.product_cols(x, x))
    x4 = LZ.redc(f, LZ.product_cols(x2, x2))
    return LZ.redc(f, LZ.product_cols(x4, x))


def _mds(f: LZ.LazyField, mats, bounds, state: List) -> List:
    """state: list of L [t, B] -> list of L [t, B]; one fused matmul per
    element chunk + one vectorized REDC."""
    planes = LZ.to_planes_bf16(state)          # [D, t, B]
    acc_cols = None
    for m, (s, e) in zip(mats, bounds):
        mat = jnp.asarray(m, dtype=jnp.bfloat16)
        pl = planes[:, s:e, :]                 # [D, chunk, B]
        out = jax.lax.dot_general(
            mat, pl,
            dimension_numbers=(((2, 3), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32).astype(jnp.uint32)   # [2*(2L), t, B]
        cols = LZ.merge_planes(out, 2 * LZ.L)
        if len(mats) > 1:
            # chunk sums can overflow uint32 if added raw: normalize each
            # chunk to exact limbs first (then limb sums are < 2^17)
            cols = LZ.carry(cols, 2 * LZ.L)
        acc_cols = cols if acc_cols is None else LZ.add_cols(acc_cols, cols)
    return LZ.redc(f, acc_cols)


def _permute(spec: PoseidonSpec, f: LZ.LazyField, rc_dev, mats, bounds,
             state: List) -> List:
    t = spec.width
    half = spec.full_rounds // 2
    rp = spec.partial_rounds

    def add_rc(state, r):
        rc = jax.lax.dynamic_index_in_dim(rc_dev, r, axis=0,
                                          keepdims=False)  # [L, t]
        return LZ.carry([state[i] + rc[i][:, None] for i in range(LZ.L)],
                        LZ.L)

    def full_round(r, st_arr):
        state = LZ.unstack(st_arr)
        state = add_rc(state, r)
        state = _sbox(f, state)
        state = _mds(f, mats, bounds, state)
        return LZ.stack(state)

    def partial_round(r, st_arr):
        state = LZ.unstack(st_arr)
        state = add_rc(state, r)
        head = _sbox(f, [x[0:1, :] for x in state])
        state = [jnp.concatenate([h, x[1:, :]], axis=0)
                 for h, x in zip(head, state)]
        state = _mds(f, mats, bounds, state)
        return LZ.stack(state)

    st = LZ.stack(state)                       # [L, t, B]
    st = jax.lax.fori_loop(0, half, full_round, st)
    st = jax.lax.fori_loop(half, half + rp, partial_round, st)
    st = jax.lax.fori_loop(half + rp, half + rp + spec.full_rounds // 2,
                           full_round, st)
    return LZ.unstack(st)


def build_mxu_hasher(field: FieldSpec, arity: int):
    """Returns hash(preimages: uint32[arity, 16, B]) -> uint32[16, B]
    (canonical domain, 16x16-bit limbs — drop-in for kernel.build_hasher).
    Jit-compatible; matmuls land on the MXU."""
    spec, f, rc_np, mats_np, bounds, tag_limbs = _mxu_constants(field, arity)

    def hasher(preimages):
        b = preimages.shape[-1]
        rc_dev = jnp.asarray(rc_np)
        # 16 -> 17 limbs (canonical values < 2^254: top limb zero)
        zero = jnp.zeros((arity, 1, b), dtype=jnp.uint32)
        pre17 = jnp.concatenate([preimages, zero], axis=1)
        pre = [pre17[:, i, :] for i in range(LZ.L)]      # lists of [arity,B]
        pre_m = LZ.to_mont(f, pre)
        tag = [jnp.full((1, b), int(tag_limbs[i]), dtype=jnp.uint32)
               for i in range(LZ.L)]
        state = [jnp.concatenate([tag[i], pre_m[i]], axis=0)
                 for i in range(LZ.L)]                    # [t, B] each
        state = _permute(spec, f, rc_dev, [jnp.asarray(m) for m in mats_np],
                         bounds, state)
        digest = LZ.from_mont(f, [x[1, :] for x in state])  # [B] each
        return jnp.stack(digest[:16], axis=0)             # [16, B]

    return hasher


@partial(jax.jit, static_argnums=(0, 1))
def _hash_mxu_jit(field: FieldSpec, arity: int, preimages):
    return build_mxu_hasher(field, arity)(preimages)
