"""Interleaved A/B benchmark: batch-affine (algo 1) vs sequential mixed
adds (algo 0) in the native Pippenger MSM. Timing only — parity is
pinned by tests/test_native.py; random non-curve coords are fine here
because the arithmetic path is identical."""

import os
import random
import time

import numpy as np

from lurk_tpu.curves.weierstrass import PALLAS
from lurk_tpu.native import msm as nmsm


def run(n_log2, reps=3):
    """Best-vs-best: each algorithm runs at ITS OWN optimal window
    (the algorithms have different bucket-reduction/accumulation cost
    ratios, so a shared c biases the comparison — ADVICE r3)."""
    n = 1 << n_log2
    r = random.Random(7)
    scalars = [r.randrange(PALLAS.order) for _ in range(n)]
    rng = np.random.default_rng(7)
    packed = rng.integers(1, 1 << 62, size=(n, 8), dtype=np.uint64)
    best = {}
    for algo in (0, 1):
        os.environ["LURK_MSM_ALGO"] = str(algo)
        base_c = nmsm._default_c(n)
        for c in range(max(4, base_c - 2), base_c + 3):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                nmsm.msm_packed(PALLAS, scalars, packed, c=c)
                ts.append(time.perf_counter() - t0)
            t = min(ts)
            if algo not in best or t < best[algo][0]:
                best[algo] = (t, c)
    (t0_, c0), (t1_, c1) = best[0], best[1]
    print(f"2^{n_log2}: algo0 {t0_:.3f}s (c={c0})  algo1 {t1_:.3f}s "
          f"(c={c1})  speedup {t0_ / t1_:.2f}x", flush=True)


if __name__ == "__main__":
    for n_log2 in (16, 18, 20):
        run(n_log2)
