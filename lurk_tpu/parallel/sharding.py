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

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curves.device import (
    JPoint, ec_add, points_from_device, points_to_device,
)
from ..curves.weierstrass import Affine, Curve
from ..fields import FieldSpec
from ..ops import limbs as L


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=("dp",))


# ---------------------------------------------------------------------------
# sharded Poseidon hydration
# ---------------------------------------------------------------------------


def shard_hash_batch(mesh: Mesh, field: FieldSpec, arity: int,
                     preimages: jnp.ndarray) -> jnp.ndarray:
    """Data-parallel batched Poseidon: preimages uint32[arity, NL, B]
    sharded on the batch axis; pure data parallel (no collectives)."""
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
              points: Sequence[Affine], c: int = 8) -> Affine:
    """MSM with points/scalars sharded across the mesh.

    Each device runs the full Pippenger window pipeline on its point
    shard; the n_devices partial results are combined with a log-depth
    EC tree on one device (complete addition handles identities)."""
    from ..msm.pippenger import _digits, _msm_jit
    n_dev = mesh.devices.size
    n = len(scalars)
    # power-of-two per-shard size (min 64) so compiled shapes are shared
    per = 64
    while per * n_dev < n:
        per *= 2
    pad = per * n_dev - n
    scalars = list(scalars) + [0] * pad
    points = list(points) + [None] * pad

    n_windows = (curve.scalar.num_bits + c - 1) // c
    digits = _digits([s % curve.order for s in scalars], c, n_windows)
    dev_points = points_to_device(curve, points)

    def shard_fn(digits_shard, pts: JPoint) -> JPoint:
        # jitted + persistent-cached; all shards share one executable
        return _msm_jit(curve, digits_shard, pts, c)

    partials: List[JPoint] = []
    for d in range(n_dev):
        sl = slice(d * per, (d + 1) * per)
        partials.append(shard_fn(
            jnp.asarray(digits[:, sl]),
            JPoint(dev_points.x[..., sl], dev_points.y[..., sl],
                   dev_points.z[..., sl])))
    # log-depth combine
    while len(partials) > 1:
        nxt = []
        for i in range(0, len(partials) - 1, 2):
            nxt.append(ec_add(curve, partials[i], partials[i + 1]))
        if len(partials) % 2:
            nxt.append(partials[-1])
        partials = nxt
    return points_from_device(curve, partials[0])[0]
