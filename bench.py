"""Headline benchmark: batched Neptune-compatible Poseidon-4 hashing
throughput on the available device (the prover's store-hydration hot loop).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north star of 1e7
Poseidon-4 hashes/s/chip (>1.0 = beating it).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from lurk_tpu.fields import PALLAS_SCALAR
    from lurk_tpu.ops import limbs as L
    from lurk_tpu.poseidon.host import hash_preimage
    from lurk_tpu.poseidon.kernel import build_hasher

    arity = 4
    batch = 1 << 17
    if jax.default_backend() != "cpu":
        # best-first kernel ladder: sublane-dense -> folded-partial ->
        # base MXU (a Mosaic regression in one must not zero the bench)
        hasher = None
        try:
            from lurk_tpu.poseidon.pallas_sb import build_pallas_sb_hasher
            hasher = jax.jit(build_pallas_sb_hasher(PALLAS_SCALAR, arity))
            hasher(jnp.zeros((arity, 16, batch),
                             jnp.uint32)).block_until_ready()
        except Exception:
            hasher = None
        if hasher is None:
            try:
                from lurk_tpu.poseidon.pallas_mxu import (
                    build_pallas_mxu_opt_hasher,
                )
                hasher = jax.jit(
                    build_pallas_mxu_opt_hasher(PALLAS_SCALAR, arity, 512))
                hasher(jnp.zeros((arity, 16, batch),
                                 jnp.uint32)).block_until_ready()
            except Exception:
                hasher = None
        if hasher is None:
            from lurk_tpu.poseidon.pallas_mxu import build_pallas_mxu_hasher
            hasher = jax.jit(
                build_pallas_mxu_hasher(PALLAS_SCALAR, arity, 512))
    else:
        batch = 1 << 16
        hasher = jax.jit(build_hasher(PALLAS_SCALAR, arity))

    f = L.limb_field(PALLAS_SCALAR)
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 1 << 16, size=(arity, L.N_LIMBS, batch),
                       dtype=np.uint32).astype(np.uint32)
    x = jnp.asarray(arr)

    # correctness spot-check on one lane
    out = np.asarray(hasher(x))
    lane = 7
    pre = f.to_ints(np.asarray(arr[:, :, lane:lane + 1]).reshape(
        arity, L.N_LIMBS, 1))
    expect = hash_preimage(PALLAS_SCALAR, pre)
    got = f.to_ints(out[:, lane:lane + 1].reshape(1, L.N_LIMBS, 1))[0]
    assert got == expect, "kernel/host mismatch"

    # timed runs; dispatches are pipelined (one sync at the end) so the
    # axon tunnel's per-call RTT does not mask device throughput
    hasher(x).block_until_ready()
    n_iters = 10
    t0 = time.perf_counter()
    outs = [hasher(x) for _ in range(n_iters)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    hashes_per_s = batch * n_iters / dt

    baseline = 1e7  # BASELINE.json north star: 1e7 Poseidon-4 hashes/s/chip
    print(json.dumps({
        "metric": "poseidon4_hashes_per_s",
        "value": round(hashes_per_s, 1),
        "unit": "hashes/s",
        "vs_baseline": round(hashes_per_s / baseline, 4),
    }))


if __name__ == "__main__":
    main()
