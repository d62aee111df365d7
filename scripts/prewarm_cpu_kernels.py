"""Prewarm the persistent JAX compile cache for the CPU-mesh kernels.

The v3 MSM kernel's XLA:CPU executables are fragile in long processes:
compiling/loading a SECOND big executable after earlier JIT activity
segfaults XLA:CPU (accumulated LLVM JIT state — CLAUDE.md). So:

  - each kernel config is warmed in its OWN subprocess (first-and-only
    big executable per process; cache writes are safe there);
  - the in-prover mesh MSM path never writes the cache at all
    (lurk_tpu.parallel.sharding._no_cache_writes).

Run once, alone, on a cold environment before the suite / dryrun:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    PYTHONPATH=/root/repo python scripts/prewarm_cpu_kernels.py

Warm run: ~2-4 min. Cold run: ~10-20 min (one compile per config).
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STAGES = {
    # test_parallel / dryrun small sharded MSM (per=64)
    "msm_small": """
import random
from lurk_tpu.curves.weierstrass import PALLAS
from lurk_tpu.parallel.sharding import default_mesh, shard_msm
rng = random.Random(3)
mesh = default_mesh(8)
n = 48
pts = [PALLAS.mul(rng.randrange(1, 1 << 60), PALLAS.generator)
       for _ in range(n)]
scalars = [rng.randrange(PALLAS.order) for _ in range(n)]
got = shard_msm(mesh, PALLAS, scalars, pts, c=8, lanes_w=8)
assert got == PALLAS.msm(scalars, pts)
print("OK")
""",
    # NOTE: only the per=64 chunk kernel exists on the CPU mesh (bigger
    # configs segfault the persistent-cache serializer/deserializer and
    # a second big in-process compile exhausts LLVM section memory);
    # each curve's kernel is warmed in its OWN subprocess.
    "msm_vesta_small": """
import random
from lurk_tpu.curves.weierstrass import VESTA as C
from lurk_tpu.parallel.sharding import default_mesh, ShardedMsmTable
rng = random.Random(3)
mesh = default_mesh(8)
m = 512
base = [C.mul(rng.randrange(1, 1 << 60), C.generator) for _ in range(64)]
pts = (base * (m // 64))[:m]
tab = ShardedMsmTable(mesh, C, pts)
sc = [rng.randrange(C.order) for _ in range(m)]
assert tab.msm(sc, c=8, lanes_w=8) == C.pippenger(sc, pts)
print("OK")
""",
    # sharded nib12 hasher at the dryrun/test batch config
    "nib12_mesh": """
import random
import jax.numpy as jnp
import numpy as np
from lurk_tpu.fields import PALLAS_SCALAR
from lurk_tpu.ops import nibbles as NB
from lurk_tpu.parallel.sharding import default_mesh, shard_hash_batch
rng = random.Random(1)
mesh = default_mesh(8)
p = PALLAS_SCALAR.modulus
arity, batch = 4, 64 * 8
pre = np.zeros((arity, 16, batch), dtype=np.uint32)
for j in range(batch):
    for a in range(arity):
        pre[a, :, j] = NB._int_to_limbs(rng.randrange(p), 16)
out = shard_hash_batch(mesh, PALLAS_SCALAR, arity, jnp.asarray(pre),
                       kernel="nib12")
np.asarray(out)
print("OK")
""",
}


def main():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["LURK_TPU_ALLOW_CACHE_WRITE"] = "1"
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    ok = True
    for name, code in STAGES.items():
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=3600)
        status = "OK" if "OK" in r.stdout else "FAIL"
        ok = ok and status == "OK"
        print(f"{name}: {status} ({time.time() - t0:.0f}s)", flush=True)
        if status != "OK":
            print(r.stderr[-1500:], flush=True)
    print("PREWARM_OK" if ok else "PREWARM_FAILED", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
