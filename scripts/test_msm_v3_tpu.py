"""Correctness + timing of the v3 (dense-emission) MSM kernel on TPU.

Usage: python scripts/test_msm_v3_tpu.py [log2_n_check] [log2_n_time]
"""
import random
import sys
import time

import jax
import jax.numpy as jnp

import lurk_tpu  # noqa: F401  (compile cache)
from lurk_tpu.curves.weierstrass import BN254_G1
from lurk_tpu.msm.device_v2 import MsmTable

curve = BN254_G1
NC = int(sys.argv[1]) if len(sys.argv) > 1 else 16
NT = int(sys.argv[2]) if len(sys.argv) > 2 else 20
r = random.Random(9)

print("devices:", jax.devices(), flush=True)


def _materialize(out):
    return float(jnp.sum(out[..., :1].astype(jnp.float32)))


def build_pts(n):
    pts = []
    acc = curve.generator
    for _ in range(1024):
        acc = curve.add(acc, curve.generator)
        pts.append(acc)
    return (pts * ((n + 1023) // 1024))[:n]


# correctness at 2^NC (distinct scalars, plus adversarial patterns)
n = 1 << NC
pts = build_pts(n)
tab = MsmTable.build(curve, pts)
for trial, scal in enumerate((
        [r.randrange(curve.order) for _ in range(n)],
        [1] * n,                                    # max-collision buckets
        [r.randrange(16) for _ in range(n)],        # tiny digits, long runs
        [0] * (n - 3) + [r.randrange(curve.order) for _ in range(3)],
)):
    t0 = time.time()
    got = tab.msm(scal)
    want = curve.pippenger(scal, pts)
    assert got == want, f"MISMATCH trial {trial}"
    print(f"2^{NC} trial {trial} OK ({time.time()-t0:.1f}s)", flush=True)

# timing at 2^NT
n = 1 << NT
pts = build_pts(n)
tab = MsmTable.build(curve, pts)
sc = [r.randrange(curve.order) for _ in range(n)]
t0 = time.time()
_materialize(tab.msm_async(sc))
print(f"2^{NT} first (incl compile): {time.time()-t0:.1f}s", flush=True)
ts = []
for _ in range(3):
    sc = [r.randrange(curve.order) for _ in range(n)]
    t0 = time.time()
    _materialize(tab.msm_async(sc))
    ts.append(time.time() - t0)
print(f"2^{NT} warm: {[f'{t*1e3:.0f}' for t in ts]} ms  best "
      f"{min(ts)*1e3:.0f} ms", flush=True)
