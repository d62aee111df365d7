"""Multi-chip data parallelism over a jax.sharding.Mesh.

The reference parallelizes with rayon inside one process (SURVEY.md
§2.4); the TPU-native analog shards the prover's batched workloads —
Poseidon hydration waves, MSM point sets, witness batches — across a
device mesh, with partial results combined via collectives or a log-depth
on-device tree.

Design (scaling-book recipe): one 1-D "dp" mesh axis; batch-axis
sharding annotations; XLA inserts the all-gathers. The MSM combine is a
tiny EC tree-add over n_devices partial sums (ICI traffic = O(devices)
points, negligible vs the sharded bucket work).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curves.weierstrass import Affine, Curve
from ..fields import FieldSpec


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=("dp",))


# ---------------------------------------------------------------------------
# sharded Poseidon hydration
# ---------------------------------------------------------------------------


def shard_hash_batch(mesh: Mesh, field: FieldSpec, arity: int,
                     preimages: jnp.ndarray,
                     kernel: str = "xla") -> jnp.ndarray:
    """Data-parallel batched Poseidon: preimages uint32[arity, NL, B]
    sharded on the batch axis; pure data parallel (no collectives).

    kernel="nib12" runs the FLAGSHIP 6th-gen pallas kernel per shard
    via shard_map (each device executes its own pallas_call on its
    local batch slice — the production hydration sharding); "xla" keeps
    the 1st-gen jnp kernel (cheap SPMD compile for smoke tests)."""
    if kernel == "nib12":
        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map
        from ..poseidon.pallas_nib12 import build_pallas_nib12_hasher
        n_dev = mesh.devices.size
        batch = preimages.shape[-1]
        assert batch % n_dev == 0
        tile = min(2048, batch // n_dev)
        hasher = build_pallas_nib12_hasher(field, arity, tile=tile)
        try:
            fn = shard_map(hasher, mesh=mesh,
                           in_specs=P(None, None, "dp"),
                           out_specs=P(None, "dp"), check_vma=False)
        except TypeError:            # older jax spells it check_rep
            fn = shard_map(hasher, mesh=mesh,
                           in_specs=P(None, None, "dp"),
                           out_specs=P(None, "dp"), check_rep=False)
        x = jax.device_put(
            preimages, NamedSharding(mesh, P(None, None, "dp")))
        return jax.jit(fn)(x)
    from ..poseidon.kernel import build_hasher
    hasher = build_hasher(field, arity)
    in_sh = NamedSharding(mesh, P(None, None, "dp"))
    out_sh = NamedSharding(mesh, P(None, "dp"))
    x = jax.device_put(preimages, in_sh)
    return jax.jit(hasher, out_shardings=out_sh)(x)


# ---------------------------------------------------------------------------
# sharded MSM
# ---------------------------------------------------------------------------


def shard_msm(mesh: Mesh, curve: Curve, scalars: Sequence[int],
              points: Sequence[Affine], c: int = 8,
              lanes_w: int = 512) -> Affine:
    """MSM with points/scalars sharded across the mesh, running the v2
    sorted-segment kernel (msm/device_v2.py) on every device.

    Each device owns a contiguous point shard (its own resident
    MsmTable) and runs the full Pippenger pipeline on its slice; the
    n_devices partial [1, 66] projective rows are combined host-side
    (n_dev - 1 complete adds — negligible vs the sharded bucket work).
    All shards share ONE compiled executable (same shapes)."""
    from ..msm import ec12 as E12
    from ..msm.device_v2 import (
        MsmTable, _jit_kernel, _unflat, pack_scalar_words,
    )
    n_dev = mesh.devices.size
    n = len(scalars)
    # power-of-two per-shard size (min 64) so compiled shapes are shared
    per = 64
    while per * n_dev < n:
        per *= 2
    pad = per * n_dev - n
    scalars = list(scalars) + [0] * pad
    points = list(points) + [None] * pad
    words = pack_scalar_words(scalars, curve.order)
    lanes_w = min(lanes_w, max(1, per // 2))
    fn = _jit_kernel(curve, lanes_w, c)
    devices = list(mesh.devices.flat)
    outs = []
    for d in range(n_dev):
        sl = slice(d * per, (d + 1) * per)
        tab = MsmTable.build(curve, points[sl])
        rows = jax.device_put(tab.rows, devices[d])
        w = jax.device_put(jnp.asarray(words[sl]), devices[d])
        outs.append(fn(rows, w))          # dispatches on device d
    partials = []
    for out in outs:
        partials.extend(E12.pt_from_device(curve, _unflat(curve, out)))
    acc = None
    for p in partials:
        acc = curve.add(acc, p)
    return acc
