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


def run(n_log2, c, reps=3):
    n = 1 << n_log2
    r = random.Random(7)
    scalars = [r.randrange(PALLAS.order) for _ in range(n)]
    rng = np.random.default_rng(7)
    packed = rng.integers(1, 1 << 62, size=(n, 8), dtype=np.uint64)
    times = {0: [], 1: []}
    for _ in range(reps):
        for algo in (0, 1):
            os.environ["LURK_MSM_ALGO"] = str(algo)
            t0 = time.perf_counter()
            nmsm.msm_packed(PALLAS, scalars, packed, c=c)
            times[algo].append(time.perf_counter() - t0)
    m0, m1 = min(times[0]), min(times[1])
    print(f"2^{n_log2} c={c}: algo0 {m0:.3f}s  algo1 {m1:.3f}s  "
          f"speedup {m0 / m1:.2f}x", flush=True)


if __name__ == "__main__":
    for n_log2, c in ((16, 13), (18, 15), (20, 16)):
        run(n_log2, c)
