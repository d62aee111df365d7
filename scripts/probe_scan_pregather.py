"""Is the in-scan gather a real cost? scan with points[idx] gather
per step vs pre-gathered dense [chunk, lanes, 44] int16 stream."""
import random
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import lurk_tpu  # noqa: F401
from lurk_tpu.curves.weierstrass import BN254_G1
from lurk_tpu.msm import ec12 as E
from lurk_tpu.msm import fe12 as F
from lurk_tpu.msm.device_v2 import MsmTable, signed_digits

curve = BN254_G1
ctx = E.ec_ctx(curve)
NL = int(sys.argv[1]) if len(sys.argv) > 1 else 20
n = 1 << NL
r = random.Random(7)
L = F.L

pts = []
acc = curve.generator
for _ in range(1024):
    acc = curve.add(acc, curve.generator)
    pts.append(acc)
pts = (pts * ((n + 1023) // 1024))[:n]
tab = MsmTable.build(curve, pts)
scalars = [r.randrange(curve.order) for _ in range(n)]
buckets, negidx = signed_digits(scalars, curve.order, 16)
dv = jax.device_put(jnp.asarray(negidx))


def _mat(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0][..., :1].astype(jnp.float32)))


def timeit(fn, *args, reps=3, label="", fresh=None):
    _mat(fn(*args))
    ts = []
    for i in range(reps):
        a = list(args)
        if fresh is not None:
            base = np.asarray(args[fresh])
            a[fresh] = jax.device_put(
                jnp.asarray((base + i + 1) % np.int32(2 ** 20)))
        t0 = time.perf_counter()
        _mat(fn(*a))
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1e3:.1f} ms", flush=True)


n_win, lanes_w = 16, 512
chunk = n // lanes_w
lanes_tot = n_win * lanes_w


@jax.jit
def scan_gather(points, vals):
    v = vals.reshape(n_win, lanes_w, chunk).transpose(2, 0, 1) \
        .reshape(chunk, lanes_tot)
    ident = E.identity(ctx, lanes_tot)

    def step(carry, vl):
        acc = E.assume_pt(curve, *carry)
        idx = vl >> 1
        neg = (vl & 1).astype(bool)
        rows = points[idx]
        x2 = F.Fe(rows[:, :L].T, ctx.p, 4096)
        y2 = F.Fe(jnp.where(neg[:, None], rows[:, 2 * L:],
                            rows[:, L:2 * L]).T, ctx.p, 4096)
        added = E.ec_madd(ctx, acc, x2, y2)
        return (added.x.cols, added.y.cols, added.z.cols), None

    init = (ident.x.cols, ident.y.cols, ident.z.cols)
    out, _ = jax.lax.scan(step, init, v)
    return out


@jax.jit
def pregather(points, vals):
    v = vals.reshape(n_win, lanes_w, chunk).transpose(2, 0, 1) \
        .reshape(chunk, lanes_tot)
    idx = v >> 1
    neg = (v & 1).astype(bool)
    rows = points[idx.reshape(-1)]          # [chunk*lanes, 66]
    xy = jnp.concatenate(
        [rows[:, :L],
         jnp.where(neg.reshape(-1)[:, None], rows[:, 2 * L:],
                   rows[:, L:2 * L])], axis=1).astype(jnp.int16)
    return xy.reshape(chunk, lanes_tot, 2 * L)


@jax.jit
def scan_dense(stream):
    ident = E.identity(ctx, stream.shape[1])

    def step(carry, sl):
        acc = E.assume_pt(curve, *carry)
        s32 = sl.astype(jnp.int32)
        x2 = F.Fe(s32[:, :L].T, ctx.p, 4096)
        y2 = F.Fe(s32[:, L:].T, ctx.p, 4096)
        added = E.ec_madd(ctx, acc, x2, y2)
        return (added.x.cols, added.y.cols, added.z.cols), None

    init = (ident.x.cols, ident.y.cols, ident.z.cols)
    out, _ = jax.lax.scan(step, init, stream)
    return out


timeit(scan_gather, tab.rows, dv, label="scan with in-scan gather",
       fresh=1)
timeit(pregather, tab.rows, dv, label="pre-gather pass alone", fresh=1)
stream = pregather(tab.rows, dv)
stream.block_until_ready()
timeit(scan_dense, stream, label="scan on dense int16 stream")

# unroll sweep on the dense scan
for u in (2, 4):
    @jax.jit
    def scan_dense_u(stream, _u=u):
        ident = E.identity(ctx, stream.shape[1])

        def step(carry, sl):
            acc = E.assume_pt(curve, *carry)
            s32 = sl.astype(jnp.int32)
            x2 = F.Fe(s32[:, :L].T, ctx.p, 4096)
            y2 = F.Fe(s32[:, L:].T, ctx.p, 4096)
            added = E.ec_madd(ctx, acc, x2, y2)
            return (added.x.cols, added.y.cols, added.z.cols), None

        init = (ident.x.cols, ident.y.cols, ident.z.cols)
        out, _ = jax.lax.scan(step, init, stream, unroll=_u)
        return out
    timeit(scan_dense_u, stream, label=f"scan dense unroll={u}")
