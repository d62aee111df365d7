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


def test_sharded_hashing_matches_host():
    mesh = default_mesh(8)
    f = L.limb_field(PALLAS_SCALAR)
    pres = [(i, i + 1, i + 2, i + 3) for i in range(16)]
    arr = np.zeros((4, L.N_LIMBS, 16), dtype=np.uint32)
    for j, pre in enumerate(pres):
        arr[:, :, j] = f.from_ints(list(pre)).T
    out = np.asarray(shard_hash_batch(mesh, PALLAS_SCALAR, 4,
                                      arr))
    got = f.to_ints(out.reshape(1, L.N_LIMBS, 16))
    want = [hash_preimage(PALLAS_SCALAR, p) for p in pres]
    assert got == want


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
