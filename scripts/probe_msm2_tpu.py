"""TPU probes for the v2 MSM: transfer bandwidth, sort cost, kernel timing."""
import time, random, sys
import numpy as np
import jax, jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

# 1. tunnel transfer bandwidth: 32MB host->device
a = np.random.randint(0, 2**31, size=(16, 1 << 20), dtype=np.int32)  # 64MB
for _ in range(3):
    t0 = time.perf_counter()
    d = jax.device_put(a)
    d.block_until_ready()
    t1 = time.perf_counter()
    print(f"device_put 64MB: {t1-t0:.3f}s ({64/(t1-t0):.0f} MB/s)", flush=True)

# 2. device sort [16, 2^20]
v = np.random.randint(0, 2**31, size=(16, 1 << 20), dtype=np.int32)
dv = jax.device_put(v)
@jax.jit
def srt(k, val):
    return jax.lax.sort_key_val(k, val, dimension=1)
o = srt(d, dv); jax.block_until_ready(o)
for _ in range(3):
    t0 = time.perf_counter()
    o = srt(d, dv); jax.block_until_ready(o)
    print(f"sort [16,2^20]: {time.perf_counter()-t0:.3f}s", flush=True)
