"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from lurk_tpu.curves.weierstrass import PALLAS
from lurk_tpu.fields import PALLAS_SCALAR
from lurk_tpu.ops import limbs as L
from lurk_tpu.parallel.sharding import (
    default_mesh, shard_hash_batch, shard_msm,
)
from lurk_tpu.poseidon.host import hash_preimage


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_mont_mul_matches_host():
    """Data-parallel sharding mechanics on a cheap kernel (the full
    sharded Poseidon hasher costs a ~30 min SPMD compile on CPU; it is
    exercised on real hardware via shard_hash_batch + dryrun)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = default_mesh(8)
    f = L.limb_field(PALLAS_SCALAR)
    import random
    r = random.Random(5)
    xs = [r.randrange(f.modulus) for _ in range(16)]
    ys = [r.randrange(f.modulus) for _ in range(16)]
    a = jax.device_put(np.asarray(f.from_ints(xs)),
                       NamedSharding(mesh, P(None, "dp")))
    b = jax.device_put(np.asarray(f.from_ints(ys)),
                       NamedSharding(mesh, P(None, "dp")))
    out = jax.jit(lambda a, b: L.mont_mul_arr(f, a, b),
                  out_shardings=NamedSharding(mesh, P(None, "dp")))(a, b)
    rinv = pow(1 << L.R_BITS, -1, f.modulus)
    got = f.to_ints(np.asarray(out)[None])
    assert got == [x * y * rinv % f.modulus for x, y in zip(xs, ys)]


def test_sharded_msm_matches_host():
    import random
    rng = random.Random(3)
    mesh = default_mesh(8)
    n = 48
    pts = [PALLAS.mul(rng.randrange(1, 1 << 60), PALLAS.generator)
           for _ in range(n)]
    scalars = [rng.randrange(PALLAS.order) for _ in range(n)]
    got = shard_msm(mesh, PALLAS, scalars, pts, c=8)
    assert got == PALLAS.msm(scalars, pts)
