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


def _candidates(arity):
    """Best-first kernel ladder: 12-bit nibble core (6th gen) -> 16-bit
    int8 nibble (5th gen) -> folded-partial bf16 -> base MXU. A Mosaic
    regression (compile failure OR wrong digests) in one kernel falls
    through to the next."""
    from lurk_tpu.fields import PALLAS_SCALAR

    def nib12_opt():
        # 7th-gen sparse-partial-round kernel (pallas_nib12_opt.py):
        # partial rounds contract element 0's planes only (~2.8x fewer
        # MXU MACs on rp rounds; 1.96M/s on v5e, +6% over nib12)
        from lurk_tpu.poseidon.pallas_nib12_opt import (
            build_pallas_nib12_opt_hasher,
        )
        return jax.jit(build_pallas_nib12_opt_hasher(
            PALLAS_SCALAR, arity, 2048, vmem_limit=100 << 20))

    def nib12():
        # 6th-gen 12-bit-limb kernel (pallas_nib12.py): split-free
        # squares + Kogge-Stone-free normalize (1.82M/s on v5e)
        from lurk_tpu.poseidon.pallas_nib12 import (
            build_pallas_nib12_hasher,
        )
        return jax.jit(build_pallas_nib12_hasher(PALLAS_SCALAR, arity,
                                                 2048,
                                                 vmem_limit=100 << 20))

    def nib():
        # 5th-gen carry-free int8 nibble-plane kernel (pallas_nib.py)
        from lurk_tpu.poseidon.pallas_nib import build_pallas_nib_hasher
        return jax.jit(build_pallas_nib_hasher(PALLAS_SCALAR, arity,
                                               2048,
                                               vmem_limit=100 << 20))

    def opt():
        # raised vmem_limit admits the 2048-lane delta scratch (~23MB):
        # bigger matmul N amortizes MXU pipeline fills (707k/s vs 639k
        # at tile 256 on v5e)
        from lurk_tpu.poseidon.pallas_mxu import (
            build_pallas_mxu_opt_hasher,
        )
        return jax.jit(build_pallas_mxu_opt_hasher(PALLAS_SCALAR, arity,
                                                   2048,
                                                   vmem_limit=100 << 20))

    def opt_small():
        from lurk_tpu.poseidon.pallas_mxu import (
            build_pallas_mxu_opt_hasher,
        )
        return jax.jit(build_pallas_mxu_opt_hasher(PALLAS_SCALAR, arity,
                                                   256))

    def base():
        from lurk_tpu.poseidon.pallas_mxu import build_pallas_mxu_hasher
        return jax.jit(build_pallas_mxu_hasher(PALLAS_SCALAR, arity, 512))

    return [nib12_opt, nib12, nib, opt, opt_small, base]


def _check(hasher, arr, x, f, field, arity) -> bool:
    from lurk_tpu.poseidon.host import hash_preimage
    from lurk_tpu.ops import limbs as L
    out = np.asarray(hasher(x))
    lane = 7
    pre = f.to_ints(np.asarray(arr[:, :, lane:lane + 1]).reshape(
        arity, L.N_LIMBS, 1))
    expect = hash_preimage(field, pre)
    got = f.to_ints(out[:, lane:lane + 1].reshape(1, L.N_LIMBS, 1))[0]
    return got == expect


def _cpu_native_bench(arity: int) -> None:
    """No TPU attached: report the native C++ host hasher instead (the
    XLA CPU compile of the batched kernel is pathological on some
    hosts)."""
    import random
    from lurk_tpu.fields import PALLAS_SCALAR
    from lurk_tpu.native import poseidon as npos
    from lurk_tpu.poseidon.host import hash_preimage
    r = random.Random(42)
    batch = 1 << 13
    pres = [tuple(r.randrange(PALLAS_SCALAR.modulus)
                  for _ in range(arity)) for _ in range(batch)]
    got = npos.hash_batch(PALLAS_SCALAR, arity, pres[:4])
    assert got == [hash_preimage(PALLAS_SCALAR, p) for p in pres[:4]]
    t0 = time.perf_counter()
    npos.hash_batch(PALLAS_SCALAR, arity, pres)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "poseidon4_hashes_per_s",
        "value": round(batch / dt, 1),
        "unit": "hashes/s (cpu-native fallback)",
        "vs_baseline": round(batch / dt / 1e7, 4),
    }))


def main() -> None:
    from lurk_tpu.fields import PALLAS_SCALAR
    from lurk_tpu.ops import limbs as L

    arity = 4
    on_device = jax.default_backend() != "cpu"
    if not on_device:
        _cpu_native_bench(arity)
        return
    batch = 1 << 17

    f = L.limb_field(PALLAS_SCALAR)
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 1 << 16, size=(arity, L.N_LIMBS, batch),
                       dtype=np.uint32).astype(np.uint32)
    x = jnp.asarray(arr)

    hasher = None
    for build in _candidates(arity):
        try:
            cand = build()
            if _check(cand, arr, x, f, PALLAS_SCALAR, arity):
                hasher = cand
                break
        except Exception:
            continue
    assert hasher is not None, "no TPU kernel passed the digest check"

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
    line = {
        "metric": "poseidon4_hashes_per_s",
        "value": round(hashes_per_s, 1),
        "unit": "hashes/s",
        "vs_baseline": round(hashes_per_s / baseline, 4),
    }
    try:
        line.update(_msm_bench())
    except Exception:
        pass
    print(json.dumps(line))


def _msm_bench() -> dict:
    """Secondary metric on the same line: the 2^20 BN254 device MSM
    (v3 kernel), single-shot and pipelined (the prover commit
    pattern). BASELINE.json north star: <100 ms on v5e-8, i.e.
    <~800 ms/chip-share."""
    import random
    from lurk_tpu.curves.weierstrass import BN254_G1
    from lurk_tpu.msm.device_v2 import MsmTable
    curve = BN254_G1
    n = 1 << 20
    r = random.Random(11)
    pts, acc = [], curve.generator
    for _ in range(1024):
        acc = curve.add(acc, curve.generator)
        pts.append(acc)
    tab = MsmTable.build(curve, (pts * (n // 1024))[:n])
    # correctness spot-check at a small size against the host oracle
    small = [r.randrange(curve.order) for _ in range(64)]
    assert tab.msm(small + [0] * (n - 64)) == \
        curve.pippenger(small, (pts * (n // 1024))[:64])

    def _mat(out):
        return float(jnp.sum(out[..., :1].astype(jnp.float32)))

    sc = [r.randrange(curve.order) for _ in range(n)]
    _mat(tab.msm_async(sc))                     # warm the executable
    ts = []
    for _ in range(2):
        sc = [r.randrange(curve.order) for _ in range(n)]
        t0 = time.perf_counter()
        _mat(tab.msm_async(sc))
        ts.append(time.perf_counter() - t0)
    single = min(ts)
    scs = [[r.randrange(curve.order) for _ in range(n)] for _ in range(4)]
    t0 = time.perf_counter()
    outs = [tab.msm_async(s) for s in scs]
    for o in outs:
        _mat(o)
    pipe = (time.perf_counter() - t0) / 4
    return {"msm_2e20_ms": round(single * 1e3, 1),
            "msm_2e20_pipelined_ms": round(pipe * 1e3, 1)}


if __name__ == "__main__":
    main()
