"""Batched Poseidon for TPU: jnp/XLA program over limb arrays.

The sponge is evaluated for B preimages at once; the state is laid out
``[width, N_LIMBS, B]`` so the batch rides the 128-wide vector lanes and the
limb axis rides sublanes. All field muls are Montgomery-domain; round
constants and the MDS matrix are pre-converted host-side.

Trace-size discipline: the S-box layer and the MDS matvec are each expressed
as ONE broadcasted Montgomery multiply over a stacked batch (width or
width^2 lanes folded into leading dims), and rounds run under
``lax.fori_loop`` with dynamically-sliced round constants — the compiled
program is small and round-count independent.

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


def _sbox_all(f: L.LimbField, st):
    x2 = L.mont_mul(f, st, st)
    x4 = L.mont_mul(f, x2, x2)
    return L.mont_mul(f, x4, st)


def _mds_matvec(f: L.LimbField, mds, st):
    # st: [t, N_LIMBS, B]; mds: [t, t, N_LIMBS, 1]
    prods = L.mont_mul(f, mds, st[None, :, :, :])  # [t_out, t_in, N, B]
    t = st.shape[0]
    acc = prods[:, 0]
    for j in range(1, t):
        acc = L.add_mod(f, acc, prods[:, j])
    return acc


def _poseidon_state_loop(spec: PoseidonSpec, f: L.LimbField, rc, mds, st):
    half = spec.full_rounds // 2
    rp = spec.partial_rounds

    def add_rc(st, r):
        c = jax.lax.dynamic_index_in_dim(rc, r, axis=0, keepdims=False)
        return L.add_mod(f, st, c)

    def full_round(r, st):
        st = add_rc(st, r)
        st = _sbox_all(f, st)
        return _mds_matvec(f, mds, st)

    def partial_round(r, st):
        st = add_rc(st, r)
        head = _sbox_all(f, st[:1])
        st = jnp.concatenate([head, st[1:]], axis=0)
        return _mds_matvec(f, mds, st)

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
        mds = jnp.asarray(mds_np)
        b = preimages.shape[-1]
        tag = jnp.broadcast_to(jnp.asarray(tag_np), (1, L.N_LIMBS, b))
        st = jnp.concatenate([tag, L.to_mont(f, preimages)], axis=0)
        st = _poseidon_state_loop(spec, f, rc, mds, st)
        return L.from_mont(f, st[1])

    return hasher


@partial(jax.jit, static_argnums=(0, 1))
def _hash_jit(field: FieldSpec, arity: int, preimages):
    return build_hasher(field, arity)(preimages)


def hash_batch_padded(field: FieldSpec, arity: int, preimages_ints) -> list:
    """Like hash_batch but pads the batch to the next power of two (min 64)
    so jit compilation happens only once per size bucket."""
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
