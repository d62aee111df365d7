"""Device-resident v3 kernel sweep at 2^20: tail group size g and
lanes_w — interleaved A/B in one process."""
import random
import time

import jax
import jax.numpy as jnp

import lurk_tpu  # noqa: F401
from lurk_tpu.curves.weierstrass import BN254_G1
from lurk_tpu.msm import device_v2 as DV

curve = BN254_G1
n = 1 << 20
r = random.Random(5)


def _mat(out):
    return float(jnp.sum(out[..., :1].astype(jnp.float32)))


pts = []
acc = curve.generator
for _ in range(1024):
    acc = curve.add(acc, curve.generator)
    pts.append(acc)
tab = DV.MsmTable.build(curve, (pts * (n // 1024))[:n])

words = [jax.device_put(jnp.asarray(DV.pack_scalar_words(
    [r.randrange(curve.order) for _ in range(n)], curve.order)))
    for _ in range(3)]

_orig_cfg = DV._cfg
variants = []
for g in (64, 32, 16):
    for lanes_w in (512, 256):
        variants.append((g, lanes_w))


def make_fn(g, lanes_w):
    def cfg(c_bits):
        n_win, n_buckets, _, _ = _orig_cfg(c_bits)
        return n_win, n_buckets, g, n_buckets // g
    DV._cfg = cfg
    try:
        import functools
        fn = jax.jit(functools.partial(DV._msm_kernel, curve, lanes_w,
                                       16))
    finally:
        DV._cfg = _orig_cfg
    return fn


fns = {}
for g, lw in variants:
    fns[(g, lw)] = make_fn(g, lw)
    # correctness once per variant on a small... (full 2^20 vs host is
    # slow; trust the g=64/512 baseline's pinned tests and compare
    # variant outputs against the baseline result instead)

base = fns[(64, 512)]
base_out = None
for rep in range(3):
    for g, lw in variants:
        fn = fns[(g, lw)]
        _mat(fn(tab.rows, words[0]))
        ts = []
        for w in words:
            t0 = time.perf_counter()
            _mat(fn(tab.rows, w))
            ts.append(time.perf_counter() - t0)
        print(f"g={g:3d} lanes_w={lw:4d}: {min(ts)*1e3:7.0f} ms",
              flush=True)
        if rep == 0:
            out = fn(tab.rows, words[0])
            if base_out is None:
                base_out = base(tab.rows, words[0])
            from lurk_tpu.msm import ec12 as E
            a = E.pt_from_device(curve, DV._unflat(curve, out))[0]
            b = E.pt_from_device(curve, DV._unflat(curve, base_out))[0]
            assert a == b, f"variant (g={g},lw={lw}) output mismatch"
    print("---", flush=True)
