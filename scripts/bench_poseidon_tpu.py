"""TPU Poseidon kernel bench: compile + correctness + throughput.

Usage: python scripts/bench_poseidon_tpu.py [kernel] [arity] [log2_batch]
kernel in {pallas, pallas_mxu, mxu, xla}. Serializes on the single TPU
chip — run one at a time.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lurk_tpu.fields import PALLAS_SCALAR
from lurk_tpu.ops import limbs as L
from lurk_tpu.poseidon.host import hash_preimage

kernel = sys.argv[1] if len(sys.argv) > 1 else "pallas_mxu"
arity = int(sys.argv[2]) if len(sys.argv) > 2 else 4
batch = 1 << (int(sys.argv[3]) if len(sys.argv) > 3 else 16)

if kernel == "pallas":
    from lurk_tpu.poseidon.pallas_kernel import build_pallas_hasher
    hasher = jax.jit(build_pallas_hasher(PALLAS_SCALAR, arity, 512))
elif kernel == "pallas_mxu":
    from lurk_tpu.poseidon.pallas_mxu import build_pallas_mxu_hasher
    hasher = jax.jit(build_pallas_mxu_hasher(PALLAS_SCALAR, arity, 512))
elif kernel == "mxu":
    from lurk_tpu.poseidon.mxu_kernel import build_mxu_hasher
    hasher = jax.jit(build_mxu_hasher(PALLAS_SCALAR, arity))
else:
    from lurk_tpu.poseidon.kernel import build_hasher
    hasher = jax.jit(build_hasher(PALLAS_SCALAR, arity))

f = L.limb_field(PALLAS_SCALAR)
rng = np.random.default_rng(42)
arr = rng.integers(0, 1 << 16, size=(arity, L.N_LIMBS, batch),
                   dtype=np.uint32).astype(np.uint32)
x = jnp.asarray(arr)

t0 = time.perf_counter()
out = np.asarray(hasher(x))
print(f"compile+first run: {time.perf_counter() - t0:.1f}s", flush=True)

for lane in (0, 7, batch - 1):
    pre = f.to_ints(arr[:, :, lane:lane + 1].reshape(arity, L.N_LIMBS, 1))
    expect = hash_preimage(PALLAS_SCALAR, pre)
    got = f.to_ints(out[:, lane:lane + 1].reshape(1, L.N_LIMBS, 1))[0]
    assert got == expect, f"lane {lane}: {hex(got)} != {hex(expect)}"
print("bit-exact vs host oracle", flush=True)

hasher(x).block_until_ready()
n_iters = 10
t0 = time.perf_counter()
for _ in range(n_iters):
    hasher(x).block_until_ready()
dt = time.perf_counter() - t0
print(f"{kernel} arity={arity} B={batch}: "
      f"{batch * n_iters / dt:,.0f} hashes/s ({dt / n_iters * 1e3:.1f} ms/iter)")
