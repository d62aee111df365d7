"""Prewarm the persistent JAX compile cache for the CPU-mesh kernels.

The v2 MSM kernel's XLA:CPU compile is pathological (~20+ min, ~70 GB
RSS at mesh shapes — see CLAUDE.md); the test suite and the multichip
dryrun assume the persistent cache (~/.lurk_tpu/jax_cache) already
holds the entry. Run THIS script once, alone, on a cold environment
before running the suite:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    PYTHONPATH=/root/repo python scripts/prewarm_cpu_kernels.py

It compiles (populating the cache; a warm run takes seconds):
  - the v2 MSM kernel at the CPU-mesh config (lanes_w=8, c=8, per-shard
    64 points) used by tests/test_parallel.py and dryrun_multichip
  - the sharded nib12 hasher at the dryrun batch config
Nothing else imports from here.
"""

import os
import sys
import time

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lurk_tpu.curves.weierstrass import PALLAS
    from lurk_tpu.fields import PALLAS_SCALAR
    from lurk_tpu.ops import nibbles as NB
    from lurk_tpu.parallel.sharding import (
        default_mesh, shard_hash_batch, shard_msm,
    )

    assert len(jax.devices()) >= 8, "virtual 8-device mesh not active"
    mesh = default_mesh(8)
    rng = random.Random(1)

    t0 = time.time()
    n = 48
    pts = [PALLAS.mul(rng.randrange(1, 1 << 60), PALLAS.generator)
           for _ in range(n)]
    scalars = [rng.randrange(PALLAS.order) for _ in range(n)]
    got = shard_msm(mesh, PALLAS, scalars, pts, c=8, lanes_w=8)
    assert got == PALLAS.msm(scalars, pts)
    print(f"msm kernel warm: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    p = PALLAS_SCALAR.modulus
    arity, batch = 4, 64 * 8
    pre = np.zeros((arity, 16, batch), dtype=np.uint32)
    for j in range(batch):
        for a in range(arity):
            pre[a, :, j] = NB._int_to_limbs(rng.randrange(p), 16)
    out = shard_hash_batch(mesh, PALLAS_SCALAR, arity,
                           jnp.asarray(pre), kernel="nib12")
    np.asarray(out)
    print(f"nib12 mesh hasher warm: {time.time() - t0:.1f}s", flush=True)
    print("PREWARM_OK", flush=True)


if __name__ == "__main__":
    main()
