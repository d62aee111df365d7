"""Measure the 12-bit pallas_nib12 kernel on TPU (compile time, digest
check, throughput)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from lurk_tpu.fields import PALLAS_SCALAR as F
from lurk_tpu.ops import limbs as L
from lurk_tpu.poseidon.pallas_nib12 import build_pallas_nib12_hasher
from lurk_tpu.poseidon.host import hash_preimage


def main():
    arity = 4
    batch = 1 << 17
    print("backend:", jax.default_backend(), flush=True)
    f = L.limb_field(F)
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 1 << 16, size=(arity, L.N_LIMBS, batch),
                       dtype=np.uint32).astype(np.uint32)
    x = jnp.asarray(arr)
    t0 = time.perf_counter()
    h = jax.jit(build_pallas_nib12_hasher(F, arity, 2048,
                                          vmem_limit=100 << 20))
    out = h(x)
    out.block_until_ready()
    print(f"compile+first run: {time.perf_counter()-t0:.1f}s", flush=True)
    out = np.asarray(out)
    lane = 7
    pre = f.to_ints(arr[:, :, lane:lane + 1].reshape(arity, L.N_LIMBS, 1))
    expect = hash_preimage(F, pre)
    got = f.to_ints(out[:, lane:lane + 1].reshape(1, L.N_LIMBS, 1))[0]
    print("digest ok:", got == expect, flush=True)
    assert got == expect
    n = 10
    t0 = time.perf_counter()
    outs = [h(x) for _ in range(n)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    print(f"{batch * n / dt:.0f} hashes/s  ({dt / n * 1000:.1f} ms/batch)",
          flush=True)


if __name__ == "__main__":
    main()
