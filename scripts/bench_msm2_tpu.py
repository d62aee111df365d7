"""TPU benchmark: device MSM v2 vs native host MSM, 2^16..2^20."""
import sys, time, random
import numpy as np

import lurk_tpu  # enables jax compile cache
from lurk_tpu.msm.device_v2 import MsmTable
from lurk_tpu.curves.weierstrass import PALLAS, BN254_G1
from lurk_tpu.native import msm as nmsm

def run(curve, n_log2, lanes_w=512, reps=3, c_bits=16):
    n = 1 << n_log2
    r = random.Random(7)
    # synthetic points: random multiples of G (host mul too slow for 2^20;
    # use doubling chain — correctness is pinned by the CPU suite, this is timing
    # + a spot parity check vs the native host MSM)
    pts = []
    acc = curve.generator
    for i in range(min(n, 4096)):
        acc = curve.add(acc, acc) if i % 7 == 3 else curve.add(acc, curve.generator)
        pts.append(acc)
    # tile to n
    pts = (pts * ((n + len(pts) - 1) // len(pts)))[:n]
    scalars = [r.randrange(curve.order) for _ in range(n)]
    t0 = time.perf_counter()
    tab = MsmTable.build(curve, pts)
    print(f"{curve.name} 2^{n_log2}: table build+upload {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    got = tab.msm(scalars, lanes_w=lanes_w, c_bits=c_bits)
    print(f"  first call (compile): {time.perf_counter()-t0:.1f}s", flush=True)
    times = []
    for _ in range(reps):
        scalars = [r.randrange(curve.order) for _ in range(n)]
        t0 = time.perf_counter()
        got = tab.msm(scalars, lanes_w=lanes_w, c_bits=c_bits)
        times.append(time.perf_counter() - t0)
    print(f"  device msm warm: {min(times):.3f}s  (lanes_w={lanes_w} c={c_bits})", flush=True)
    # native host comparison + parity
    packed = nmsm.pack_points(pts)
    t0 = time.perf_counter()
    want = nmsm.msm_packed(curve, scalars, packed)
    th = time.perf_counter() - t0
    print(f"  native host msm: {th:.3f}s  speedup {th/min(times):.2f}x  parity={'OK' if got == want else 'FAIL'}", flush=True)

def run_pipelined(curve, n_log2, depth=6, lanes_w=512, c_bits=16):
    """Prover-shaped throughput: `depth` MSMs dispatched back-to-back
    (fresh scalars each) and materialized together — host digitize/
    upload overlaps device compute."""
    import numpy as np
    n = 1 << n_log2
    r = random.Random(11)
    pts = []
    acc = curve.generator
    for i in range(min(n, 4096)):
        acc = curve.add(acc, curve.generator)
        pts.append(acc)
    pts = (pts * ((n + len(pts) - 1) // len(pts)))[:n]
    tab = MsmTable.build(curve, pts)
    sc0 = [r.randrange(curve.order) for _ in range(n)]
    out = tab.msm(sc0, lanes_w=lanes_w, c_bits=c_bits)  # compile
    batches = [[r.randrange(curve.order) for _ in range(n)]
               for _ in range(depth)]
    t0 = time.perf_counter()
    outs = [tab.msm_async(sc, lanes_w=lanes_w, c_bits=c_bits)
            for sc in batches]
    # materialize (tiny host read-back per result)
    tot = sum(int(np.asarray(o)[0, 0]) for o in outs)
    dt = time.perf_counter() - t0
    print(f"{curve.name} 2^{n_log2} pipelined x{depth}: "
          f"{dt:.2f}s total, {dt/depth:.3f}s/msm", flush=True)


if __name__ == "__main__":
    import os
    c_bits = int(os.environ.get("MSM_C", "16"))
    nl = [int(x) for x in sys.argv[1:]] or [16, 18, 20]
    for n_log2 in nl:
        if os.environ.get("MSM_PIPELINED"):
            run_pipelined(BN254_G1, n_log2, c_bits=c_bits)
        else:
            run(BN254_G1, n_log2, c_bits=c_bits)
