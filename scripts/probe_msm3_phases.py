"""Phase split for the v3 (dense-emission) MSM kernel at 2^20:
host pack, upload, device-resident kernel, readback."""
import random
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import lurk_tpu  # noqa: F401
from lurk_tpu.curves.weierstrass import BN254_G1
from lurk_tpu.msm.device_v2 import (
    MsmTable, _jit_kernel, pack_scalar_words,
)

curve = BN254_G1
NL = int(sys.argv[1]) if len(sys.argv) > 1 else 20
n = 1 << NL
r = random.Random(5)


def _mat(out):
    return float(jnp.sum(out[..., :1].astype(jnp.float32)))


pts = []
acc = curve.generator
for _ in range(1024):
    acc = curve.add(acc, curve.generator)
    pts.append(acc)
pts = (pts * ((n + 1023) // 1024))[:n]
tab = MsmTable.build(curve, pts)
fn = _jit_kernel(curve, 512, 16)

# host pack
scal = [r.randrange(curve.order) for _ in range(n)]
t0 = time.perf_counter()
words = pack_scalar_words(scal, curve.order)
t_pack = time.perf_counter() - t0
print(f"host pack_scalar_words: {t_pack*1e3:.0f} ms", flush=True)

# upload
t0 = time.perf_counter()
dw = jax.device_put(jnp.asarray(words))
dw.block_until_ready()
_ = float(jnp.sum(dw[:1].astype(jnp.float32)))   # force real arrival
t_up = time.perf_counter() - t0
print(f"upload words [n,8] int32 ({words.nbytes/1e6:.0f} MB): "
      f"{t_up*1e3:.0f} ms", flush=True)

# device-resident kernel (fresh words each rep, pre-uploaded)
_mat(fn(tab.rows, dw))
reps = []
for i in range(3):
    sc = [r.randrange(curve.order) for _ in range(n)]
    w = jax.device_put(jnp.asarray(pack_scalar_words(sc, curve.order)))
    _ = float(jnp.sum(w[:1].astype(jnp.float32)))
    t0 = time.perf_counter()
    _mat(fn(tab.rows, w))
    reps.append(time.perf_counter() - t0)
print(f"device-resident kernel: {[f'{t*1e3:.0f}' for t in reps]} ms",
      flush=True)

# pipelined end-to-end (the prover pattern): 4 MSMs back-to-back
scs = [[r.randrange(curve.order) for _ in range(n)] for _ in range(4)]
t0 = time.perf_counter()
outs = [tab.msm_async(s) for s in scs]
for o in outs:
    _mat(o)
t_pipe = (time.perf_counter() - t0) / 4
print(f"pipelined e2e: {t_pipe*1e3:.0f} ms/msm", flush=True)
