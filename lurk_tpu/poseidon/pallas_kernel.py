"""Pallas TPU kernel: batched Poseidon with VMEM-resident state.

The XLA fori_loop formulation (kernel.py) round-trips the [t, 16, B]
state through HBM every round (64 rounds of ~MB-scale loop carries =
memory-bound). This kernel tiles the batch over the grid; each grid step
loads its preimage block into VMEM once, runs the whole permutation from
VMEM, and writes only the digest block.

Uses the compact stacked-array limb core (lurk_tpu.ops.limbs *_arr) so
the Mosaic trace stays small: rounds run under lax.fori_loop with
VMEM-resident round constants.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import FieldSpec
from ..ops import limbs as L
from .kernel import _kernel_constants, _poseidon_state_loop

# batch tile per grid step (multiple of 128 lanes)
DEFAULT_TILE = 256


def build_pallas_hasher(field: FieldSpec, arity: int,
                        tile: int = DEFAULT_TILE):
    """Returns hash(preimages: uint32[arity, N_LIMBS, B]) -> [N_LIMBS, B];
    B must be a multiple of `tile`."""
    spec, f, rc_np, mds_np, tag_np = _kernel_constants(field, arity)
    t = spec.width
    n_rounds = spec.full_rounds + spec.partial_rounds
    r2 = L._int_to_limbs(f.r2).reshape(L.N_LIMBS, 1)
    one = L._int_to_limbs(1).reshape(L.N_LIMBS, 1)

    def _const_limbs(limbs_np, shape):
        """Per-limb scalar constants -> array (no captured array consts)."""
        return jnp.stack(
            [jnp.full(shape, int(limbs_np[k]), jnp.uint32)
             for k in range(L.N_LIMBS)], axis=-2)

    def kernel(rc_ref, mds_ref, in_ref, out_ref):
        bt = in_ref.shape[-1]
        mds = mds_ref[...]
        # to Montgomery domain
        raw = in_ref[...]                              # [arity, NL, bt]
        r2c = _const_limbs(r2[:, 0], (arity, bt))
        pre = L.mont_mul_arr(f, raw, r2c)
        tag = _const_limbs(tag_np[:, 0], (1, bt))
        st = jnp.concatenate([tag, pre], axis=0)
        def get_rc(r):
            # 2D ref + dynamic row slice; only a trailing unit dim is
            # added afterwards (Mosaic rejects data-moving reshapes)
            rows = rc_ref[pl.ds(r * t, t), :]      # [t, N_LIMBS]
            return rows[:, :, None]
        st = _poseidon_state_loop(spec, f, get_rc, mds, st)
        onec = _const_limbs(one[:, 0], (bt,))
        digest = jnp.squeeze(jax.lax.slice_in_dim(st, 1, 2, axis=0), 0)
        out_ref[...] = L.mont_mul_arr(f, digest, onec)

    rc_arr = jnp.asarray(rc_np).reshape(n_rounds * t, L.N_LIMBS)
    mds_arr = jnp.asarray(mds_np)     # [t, t, NL, 1]

    def hasher(preimages):
        b = preimages.shape[-1]
        assert b % tile == 0, f"batch {b} not a multiple of {tile}"
        grid = (b // tile,)
        return pl.pallas_call(
            kernel,
            interpret=jax.default_backend() == "cpu",
            grid=grid,
            in_specs=[
                pl.BlockSpec((n_rounds * t, L.N_LIMBS),
                             lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, t, L.N_LIMBS, 1),
                             lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((arity, L.N_LIMBS, tile),
                             lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L.N_LIMBS, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L.N_LIMBS, b), jnp.uint32),
        )(rc_arr, mds_arr, preimages)

    return hasher


@partial(jax.jit, static_argnums=(0, 1, 2))
def _hash_pallas_jit(field: FieldSpec, arity: int, tile: int, preimages):
    return build_pallas_hasher(field, arity, tile)(preimages)


def hash_batch_pallas(field: FieldSpec, arity: int, preimages_ints,
                      tile: int = DEFAULT_TILE) -> list:
    """Host API mirroring kernel.hash_batch via the Pallas path."""
    f = L.limb_field(field)
    n = len(preimages_ints)
    size = tile
    while size < n:
        size += tile
    arr = np.zeros((arity, L.N_LIMBS, size), dtype=np.uint32)
    for j, pre in enumerate(preimages_ints):
        cols = f.from_ints(list(pre))
        arr[:, :, j] = cols.T
    out = np.asarray(_hash_pallas_jit(field, arity, tile,
                                      jnp.asarray(arr)))
    return f.to_ints(out.reshape(1, L.N_LIMBS, size))[:n]
