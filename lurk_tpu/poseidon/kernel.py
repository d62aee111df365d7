"""Batched Poseidon for TPU: jnp/XLA program over limb arrays.

The sponge is evaluated for B preimages at once; the state is laid out
``[width, N_LIMBS, B]`` so the batch rides the 128-wide vector lanes and
the limb axis rides sublanes. All field muls are Montgomery-domain; round
constants and the MDS matrix are pre-converted host-side.

Performance structure:
  - per-round bodies run fully UNROLLED straight-line limb code (Python
    lists of vector registers — no scatters, no dynamic slices inside the
    field ops; see lurk_tpu.ops.limbs);
  - rounds run under ``lax.fori_loop`` with dynamically-sliced round
    constants, so the compiled program is small and round-count
    independent;
  - the MDS matvec uses ``mont_dot`` (one Montgomery reduction per
    accumulation chunk instead of one per product).

This replaces the reference's rayon-parallel host hashing
(/root/reference/src/lem/store_core.rs:256-269) with a single device batch.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FieldSpec
from ..ops import limbs as L
from .spec import PoseidonSpec, poseidon_spec


def _mont_limbs(f: L.LimbField, values) -> np.ndarray:
    """[len(values), N_LIMBS, 1] Montgomery-form constants."""
    return np.stack([L.mont_constant(f, v) for v in values])


@lru_cache(maxsize=None)
def _kernel_constants(field: FieldSpec, arity: int):
    spec = poseidon_spec(field, arity)
    f = L.limb_field(field)
    t = spec.width
    n_rounds = spec.full_rounds + spec.partial_rounds
    rc = np.asarray(spec.round_constants).reshape(n_rounds, t)
    rc_mont = np.stack(
        [_mont_limbs(f, row) for row in rc]
    )  # [n_rounds, t, N_LIMBS, 1]
    mds_mont = np.stack(
        [_mont_limbs(f, row) for row in spec.mds]
    )  # [t_out, t_in, N_LIMBS, 1]  (symmetric matrix; orientation free)
    tag_mont = L.mont_constant(f, spec.domain_tag)  # [N_LIMBS, 1]
    return spec, f, rc_mont, mds_mont, tag_mont


def _sbox_arr(f, x):
    """x^5 on [..., N_LIMBS, B]."""
    x2 = L.mont_mul_arr(f, x, x)
    x4 = L.mont_mul_arr(f, x2, x2)
    return L.mont_mul_arr(f, x4, x)


def _mds_mul_arr(f: L.LimbField, mds, st):
    """MDS matvec: st [t_in, N_LIMBS, B], mds [t_out, t_in, N_LIMBS, 1]
    Montgomery constants. Product columns for all (t_out, t_in) pairs in
    one broadcast; sum over t_in chunks pre-reduction (T < R*p bound);
    one Montgomery reduction per chunk for all outputs."""
    t = mds.shape[0]
    kmax = L.max_dot_terms(f)
    acc = None
    for s in range(0, t, kmax):
        e = min(s + kmax, t)
        # explicit slices (jnp fancy indexing lowers to gather, which
        # Mosaic supports only in 2D)
        mds_c = jax.lax.slice_in_dim(mds, s, e, axis=1)
        st_c = jnp.expand_dims(jax.lax.slice_in_dim(st, s, e, axis=0), 0)
        cols4 = L._product_cols_arr(mds_c, st_c)  # [t_out, c, 2N+1, B]
        # explicit fold (Mosaic lacks unsigned reductions)
        cols = jax.lax.index_in_dim(cols4, 0, axis=1, keepdims=False)
        for j in range(1, e - s):
            cols = cols + jax.lax.index_in_dim(cols4, j, axis=1,
                                               keepdims=False)
        part = L._mont_reduce_arr(f, cols)    # [t_out, N_LIMBS, B]
        acc = part if acc is None else L.add_arr(f, acc, part)
    return acc


def _poseidon_state_loop(spec: PoseidonSpec, f: L.LimbField, get_rc, mds,
                         st):
    """st: [t, N_LIMBS, B] -> permuted. get_rc(r) -> [t, N_LIMBS, 1]
    (accessor so Pallas can index the constants ref directly),
    mds: [t, t, N_LIMBS, 1] (jnp, Montgomery form)."""
    half = spec.full_rounds // 2
    rp = spec.partial_rounds

    def add_rc(st, r):
        c = get_rc(r)
        return L.add_arr(f, st, jnp.broadcast_to(c, st.shape))

    def full_round(r, st):
        st = add_rc(st, r)
        st = _sbox_arr(f, st)
        return _mds_mul_arr(f, mds, st)

    def partial_round(r, st):
        st = add_rc(st, r)
        head = _sbox_arr(f, jax.lax.slice_in_dim(st, 0, 1, axis=0))
        rest = jax.lax.slice_in_dim(st, 1, st.shape[0], axis=0)
        st = jnp.concatenate([head, rest], axis=0)
        return _mds_mul_arr(f, mds, st)

    # Partial rounds run in unrolled GROUPS under one fori_loop — fusing
    # `unroll` rounds per loop iteration cuts the HBM loop-carry traffic
    # that dominates the runtime (56 of 64 rounds are partial). The
    # unroll factor trades compile time (trace size) for bandwidth.
    unroll = 4
    n_chunks = rp // unroll

    def chunk_body(ci, st):
        base = half + ci * unroll
        for j in range(unroll):
            st = partial_round(base + j, st)
        return st

    st = jax.lax.fori_loop(0, half, full_round, st)
    if n_chunks:
        st = jax.lax.fori_loop(0, n_chunks, chunk_body, st)
    for r in range(half + n_chunks * unroll, half + rp):
        st = partial_round(r, st)
    st = jax.lax.fori_loop(half + rp, half + rp + spec.full_rounds // 2,
                           full_round, st)
    return st


def _sbox_list(f, x):
    """x^5 on a limb list (limbs may carry leading dims, e.g. [t, B])."""
    x2 = L.mont_mul_list(f, x, x)
    x4 = L.mont_mul_list(f, x2, x2)
    return L.mont_mul_list(f, x4, x)


def _mds_mul_list(f: L.LimbField, mds_np: np.ndarray, lanes):
    """MDS matvec on stacked lanes.

    lanes: limb list, each [t, B]. mds_np: [t, t, N_LIMBS, 1] Montgomery
    constants. Products for all (t_out, t_in) pairs are computed with one
    broadcast multiply per limb pair; the sum over t_in happens on the
    lo/hi pieces (pre-reduction), chunked to the T < R*p soundness bound;
    one Montgomery reduction per chunk for ALL t outputs at once.
    """
    t = mds_np.shape[0]
    kmax = L.max_dot_terms(f)
    acc = None
    for start in range(0, t, kmax):
        end = min(start + kmax, t)
        cols = [None] * (2 * L.N_LIMBS + 1)
        for k in range(L.N_LIMBS):
            # constants limb k for this input chunk: [t_out, chunk]
            m_k = jnp.asarray(mds_np[:, start:end, k, 0])
            for l_ in range(L.N_LIMBS):
                # [t_out, chunk, B] product; uint32-exact (16x16 bits)
                prod = m_k[:, :, None] * lanes[l_][None, start:end, :]
                lo = jnp.sum(prod & L.LIMB_MASK, axis=1)
                hi = jnp.sum(prod >> L.LIMB_BITS, axis=1)
                kl = k + l_
                cols[kl] = lo if cols[kl] is None else cols[kl] + lo
                cols[kl + 1] = (hi if cols[kl + 1] is None
                                else cols[kl + 1] + hi)
        part = L._mont_reduce(f, cols)  # limb list of [t_out, B]
        acc = part if acc is None else L.add_list(f, acc, part)
    return acc


def _poseidon_state_loop_list(spec: PoseidonSpec, f: L.LimbField, rc, mds_np,
                         st):
    """st: [N_LIMBS, t, B] as limb list of [t, B] -> permuted.
    rc: [n_rounds, t, N_LIMBS, 1]."""
    t = spec.width
    half = spec.full_rounds // 2
    rp = spec.partial_rounds

    def unpack(st):
        return [st[k] for k in range(L.N_LIMBS)]

    def pack(lanes):
        return jnp.stack(lanes, axis=0)

    def add_rc(lanes, r):
        c = jax.lax.dynamic_index_in_dim(rc, r, axis=0, keepdims=False)
        # c: [t, N_LIMBS, 1] -> limb list of [t, 1]
        return L.add_list(f, lanes, [c[:, k, :] for k in range(L.N_LIMBS)])

    def full_round(r, st):
        lanes = unpack(st)
        lanes = add_rc(lanes, r)
        lanes = _sbox_list(f, lanes)
        return pack(_mds_mul_list(f, mds_np, lanes))

    def partial_round(r, st):
        lanes = unpack(st)
        lanes = add_rc(lanes, r)
        head = _sbox_list(f, [x[0:1, :] for x in lanes])
        lanes = [jnp.concatenate([h, x[1:, :]], axis=0)
                 for h, x in zip(head, lanes)]
        return pack(_mds_mul_list(f, mds_np, lanes))

    st = jax.lax.fori_loop(0, half, full_round, st)
    st = jax.lax.fori_loop(half, half + rp, partial_round, st)
    st = jax.lax.fori_loop(half + rp, half + rp + spec.full_rounds // 2,
                           full_round, st)
    return st



def build_hasher(field: FieldSpec, arity: int):
    """Returns ``hash(preimages)`` with preimages ``uint32[arity, N_LIMBS, B]``
    (canonical domain) -> digests ``uint32[N_LIMBS, B]``. Jit-compatible."""
    spec, f, rc_np, mds_np, tag_np = _kernel_constants(field, arity)

    def hasher(preimages):
        rc = jnp.asarray(rc_np)
        b = preimages.shape[-1]
        tag = jnp.broadcast_to(jnp.asarray(tag_np), (1, L.N_LIMBS, b))
        st = jnp.concatenate([tag, L.to_mont(f, preimages)], axis=0)
        # limb-major for the list core: [N_LIMBS, t, B]
        st = jnp.transpose(st, (1, 0, 2))
        st = _poseidon_state_loop_list(spec, f, rc, mds_np, st)
        return L.from_mont(f, st[:, 1, :])

    return hasher


@partial(jax.jit, static_argnums=(0, 1))
def _hash_jit(field: FieldSpec, arity: int, preimages):
    return build_hasher(field, arity)(preimages)


def _use_pallas() -> bool:
    """The Pallas MXU kernel (pallas_mxu.py: VMEM-resident state +
    constant-Toeplitz digit-plane matmuls) is ~5x the XLA path on real
    TPU hardware; the XLA path is the CPU/interpret fallback."""
    import jax
    return jax.default_backend() not in ("cpu",)


def hash_batch_padded(field: FieldSpec, arity: int, preimages_ints) -> list:
    """Like hash_batch but pads the batch to the next power of two (min 64)
    so jit compilation happens only once per size bucket."""
    if _use_pallas():
        from .pallas_mxu import hash_batch_pallas_mxu
        return hash_batch_pallas_mxu(field, arity, preimages_ints, tile=512)
    n = len(preimages_ints)
    size = 64
    while size < n:
        size *= 2
    padded = list(preimages_ints) + [(0,) * arity] * (size - n)
    return hash_batch(field, arity, padded)[:n]


def hash_batch(field: FieldSpec, arity: int, preimages_ints) -> list:
    """Convenience host API: list of length-``arity`` int tuples -> digests
    as python ints (device round-trip, jitted)."""
    f = L.limb_field(field)
    n = len(preimages_ints)
    arr = np.zeros((arity, L.N_LIMBS, n), dtype=np.uint32)
    for j, pre in enumerate(preimages_ints):
        assert len(pre) == arity
        cols = f.from_ints(list(pre))  # [N_LIMBS, arity]
        arr[:, :, j] = cols.T
    out = np.asarray(_hash_jit(field, arity, jnp.asarray(arr)))
    return f.to_ints(out.reshape(1, L.N_LIMBS, n))
