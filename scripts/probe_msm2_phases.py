"""Phase-level timing of the v2 device MSM at 2^18/2^20: sort cost,
scan-only cost, madd floor, and lanes_w sweep — to find where the
5.8s @ 2^20 (vs the ~0.5s VPU-math floor estimate) actually goes."""
import sys
import time
import random

import numpy as np
import jax
import jax.numpy as jnp

import lurk_tpu  # noqa: F401  (compile cache)
from lurk_tpu.curves.weierstrass import BN254_G1
from lurk_tpu.msm import ec12 as E
from lurk_tpu.msm import fe12 as F
from lurk_tpu.msm.device_v2 import MsmTable, _cfg, signed_digits, _flat, _unflat

curve = BN254_G1
ctx = E.ec_ctx(curve)
NL = int(sys.argv[1]) if len(sys.argv) > 1 else 18
n = 1 << NL
r = random.Random(7)

print("devices:", jax.devices(), flush=True)

# build a small cyclic point set tiled to n (timing only)
pts = []
acc = curve.generator
for i in range(1024):
    acc = curve.add(acc, curve.generator)
    pts.append(acc)
pts = (pts * ((n + 1023) // 1024))[:n]
tab = MsmTable.build(curve, pts)
scalars = [r.randrange(curve.order) for _ in range(n)]
buckets, negidx = signed_digits(scalars, curve.order, 16)
db = jax.device_put(jnp.asarray(buckets))
dv = jax.device_put(jnp.asarray(negidx))


def _materialize(out):
    """Forcing a (tiny) host read-back is the ONLY trustworthy
    completion barrier over the axon tunnel — block_until_ready
    returns at enqueue-ACK for remote executions."""
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0][..., :1].astype(jnp.float32)))


def timeit(fn, *args, reps=3, label="", fresh=None):
    """fresh: index of the arg to replace per rep (defeats result
    caching keyed on input buffers); variants prepared OUTSIDE timing."""
    _materialize(fn(*args))
    variants = []
    for i in range(reps):
        a = list(args)
        if fresh is not None:
            base = np.asarray(args[fresh])
            a[fresh] = jax.device_put(
                jnp.asarray((base + i + 1) % np.int32(2 ** 20)))
        variants.append(a)
    ts = []
    for a in variants:
        t0 = time.perf_counter()
        _materialize(fn(*a))
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1e3:.1f} ms", flush=True)
    return min(ts)


# 1. sort phase alone
@jax.jit
def sort_only(b, v):
    return jax.lax.sort_key_val(b, v, dimension=1)

timeit(sort_only, db, dv, label=f"sort [16, 2^{NL}]", fresh=0)


# 2. pure madd chain: chunk steps of ec_madd at batch lanes_tot,
#    gather included, NO bucket table, NO flush logic
def make_scan_only(lanes_w):
    n_win = 16
    chunk = n // lanes_w
    lanes_tot = n_win * lanes_w
    L = F.L

    @jax.jit
    def scan_only(points, vals):
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

    return scan_only


for lanes_w in (512, 1024, 2048):
    fn = make_scan_only(lanes_w)
    t = timeit(fn, tab.rows, dv,
               label=f"scan-only (gather+madd) lanes_w={lanes_w} "
                     f"steps={n // lanes_w}", fresh=1)

# 3. full kernel at the default and wider lanes
for lanes_w in (512, 1024):
    t0 = time.perf_counter()
    out = tab.msm_async(scalars, lanes_w=lanes_w)
    _materialize(out)
    print(f"full kernel lanes_w={lanes_w} first: "
          f"{time.perf_counter()-t0:.1f} s", flush=True)
    ts = []
    for _ in range(2):
        sc = [r.randrange(curve.order) for _ in range(n)]
        t0 = time.perf_counter()
        out = tab.msm_async(sc, lanes_w=lanes_w)
        _materialize(out)
        ts.append(time.perf_counter() - t0)
    print(f"full kernel lanes_w={lanes_w} warm: {min(ts)*1e3:.0f} ms",
          flush=True)


# 4. scan WITH the full flush logic + bucket table (exact step body from
#    device_v2) — isolates the cost of carrying/scattering btab in-scan.
from lurk_tpu.msm.device_v2 import _ident_rows, _carry
from lurk_tpu.msm.ec12 import Pt, ec_madd, pt_select


def make_scan_flush(lanes_w, with_table=True):
    n_win = 16
    stride = (1 << 15) + 1
    chunk = n // lanes_w
    lanes_tot = n_win * lanes_w
    L = F.L
    win_id = jnp.repeat(jnp.arange(n_win, dtype=jnp.int32), lanes_w)
    table_rows = n_win * stride

    @jax.jit
    def scan_flush(points, bkt, vals):
        keys = bkt.reshape(n_win, lanes_w, chunk).transpose(2, 0, 1) \
            .reshape(chunk, lanes_tot)
        v = vals.reshape(n_win, lanes_w, chunk).transpose(2, 0, 1) \
            .reshape(chunk, lanes_tot)
        btab0 = jnp.asarray(_ident_rows(curve, table_rows if with_table
                                        else 8))
        ident = E.identity(ctx, lanes_tot)

        def step(carry, inp):
            (ax, ay, az, cur, seen, headk, hrows, btab) = carry
            key, vl = inp
            acc = E.assume_pt(curve, ax, ay, az)
            is_new = key != cur
            closing = is_new & (cur != 0)
            rec_head = closing & ~seen
            headk = jnp.where(rec_head, cur, headk)
            acc_rows = jnp.concatenate(
                [acc.x.cols.T, acc.y.cols.T, acc.z.cols.T], axis=1)
            hrows = jnp.where(rec_head[:, None], acc_rows, hrows)
            flush = closing & seen
            lim = table_rows if with_table else 8
            scat = jnp.where(flush, (win_id * stride + cur) %
                             jnp.int32(lim), lim)
            btab = btab.at[scat].set(acc_rows, mode="drop")
            seen = seen | closing
            acc = pt_select(is_new[None, :], ident, acc)
            idx = vl >> 1
            neg = (vl & 1).astype(bool)
            rows = points[idx]
            x2 = F.Fe(rows[:, :L].T, ctx.p, 4096)
            y2 = F.Fe(jnp.where(neg[:, None], rows[:, 2 * L:],
                                rows[:, L:2 * L]).T, ctx.p, 4096)
            added = ec_madd(ctx, acc, x2, y2)
            out = pt_select((key != 0)[None, :], added, acc)
            return (*_carry(out), key, seen, headk, hrows, btab), None

        init = (*_carry(ident),
                jnp.zeros((lanes_tot,), jnp.int32),
                jnp.zeros((lanes_tot,), bool),
                keys[0],
                jnp.asarray(_ident_rows(curve, lanes_tot)), btab0)
        (ax, ay, az, cur, seen, headk, hrows, btab), _ = jax.lax.scan(
            step, init, (keys, v))
        return btab

    return scan_flush


for with_table in (True, False):
    fn = make_scan_flush(512, with_table)
    timeit(fn, tab.rows, db, dv,
           label=f"scan+flush with_table={with_table}", fresh=2)


# 5. tail phases only (bucket reduction + trees + ladder + window
#    combine), fed a synthetic bucket table with in-range limbs.
from lurk_tpu.msm.device_v2 import _tree_sum_flat


def make_tail(c_bits):
    from lurk_tpu.msm.device_v2 import _cfg
    n_win, n_buckets, group_g, groups = _cfg(c_bits)
    stride = n_buckets + 1
    table_rows = n_win * stride
    L = F.L

    @jax.jit
    def tail(btab):
        slab = btab.reshape(n_win, stride, 66)[:, 1:1 + n_buckets]
        slab = slab.reshape(n_win, groups, group_g, 66) \
            .transpose(2, 0, 1, 3).reshape(group_g, n_win * groups, 66)
        gident = E.identity(ctx, n_win * groups)

        def red_step(carry, rows):
            rx, ry, rz, tx, ty, tz = carry
            from lurk_tpu.msm.device_v2 import _unflat
            run = E.ec_add(ctx, E.assume_pt(curve, rx, ry, rz),
                           _unflat(curve, rows))
            tot = E.ec_add(ctx, E.assume_pt(curve, tx, ty, tz), run)
            return (*_carry(run), *_carry(tot)), None

        ginit = (*_carry(gident), *_carry(gident))
        (rx, ry, rz, tx, ty, tz), _ = jax.lax.scan(
            red_step, ginit, slab[::-1])
        from lurk_tpu.msm.device_v2 import _flat, _unflat, _ident_rows
        s_rows = _flat(E.assume_pt(curve, rx, ry, rz))
        w_rows = _flat(E.assume_pt(curve, tx, ty, tz))
        kvec = jnp.tile(jnp.arange(groups, dtype=jnp.int32), n_win)
        kbits = (groups - 1).bit_length()
        planes = [w_rows]
        id_rows = jnp.asarray(_ident_rows(curve, n_win * groups))
        for j in range(kbits):
            selj = (((kvec >> j) & 1) == 1)[:, None]
            planes.append(jnp.where(selj, s_rows, id_rows))
        stackd = jnp.concatenate(planes, axis=0)
        sums = _tree_sum_flat(curve, stackd, (1 + kbits) * n_win, groups)
        return sums

    return tail


for c_bits in (16,):
    from lurk_tpu.msm.device_v2 import _cfg as cfg_
    n_win, n_buckets, _, _ = cfg_(c_bits)
    rows_n = n_win * (n_buckets + 1)
    rng = np.random.default_rng(1)
    btab_h = rng.integers(0, 4096, size=(rows_n, 66), dtype=np.int32)
    btab_d = jax.device_put(jnp.asarray(btab_h))
    fn = make_tail(c_bits)
    timeit(fn, btab_d, label=f"tail reduction+tree c={c_bits}", fresh=0)


# 6. ladder + horner-ish serial small-batch cost: 252 sequential
#    ec_adds at batch n_win — measures dispatch/latency floor.
def make_ladder(n_win, iters):
    @jax.jit
    def ladder(rows):
        from lurk_tpu.msm.device_v2 import _unflat, _carry as C
        pt = _unflat(curve, rows)

        def body(t, c3):
            q = E.assume_pt(curve, *c3)
            return C(E.ec_add(ctx, q, q))

        out = jax.lax.fori_loop(0, iters, body, C(pt))
        from lurk_tpu.msm.device_v2 import _flat
        return _flat(E.assume_pt(curve, *out))
    return ladder


rng = np.random.default_rng(2)
small = jax.device_put(jnp.asarray(
    rng.integers(0, 4096, size=(16, 66), dtype=np.int32)))
timeit(make_ladder(16, 240), small, label="240 serial ec_add batch16",
       fresh=0)


# 7. scatter-row-alignment experiment: same scan+flush, but btab rows
#    padded 66 -> 128 ints (one 512B line per row).
def make_scan_flush_pad(lanes_w):
    n_win = 16
    stride = (1 << 15) + 1
    chunk = n // lanes_w
    lanes_tot = n_win * lanes_w
    L = F.L
    win_id = jnp.repeat(jnp.arange(n_win, dtype=jnp.int32), lanes_w)
    table_rows = n_win * stride

    @jax.jit
    def scan_flush(points, bkt, vals):
        keys = bkt.reshape(n_win, lanes_w, chunk).transpose(2, 0, 1) \
            .reshape(chunk, lanes_tot)
        v = vals.reshape(n_win, lanes_w, chunk).transpose(2, 0, 1) \
            .reshape(chunk, lanes_tot)
        btab0 = jnp.zeros((table_rows, 128), dtype=jnp.int32)
        ident = E.identity(ctx, lanes_tot)

        def step(carry, inp):
            (ax, ay, az, cur, seen, headk, hrows, btab) = carry
            key, vl = inp
            acc = E.assume_pt(curve, ax, ay, az)
            is_new = key != cur
            closing = is_new & (cur != 0)
            rec_head = closing & ~seen
            headk = jnp.where(rec_head, cur, headk)
            acc_rows = jnp.concatenate(
                [acc.x.cols.T, acc.y.cols.T, acc.z.cols.T,
                 jnp.zeros((lanes_tot, 62), jnp.int32)], axis=1)
            hrows = jnp.where(rec_head[:, None], acc_rows[:, :66], hrows)
            flush = closing & seen
            scat = jnp.where(flush, win_id * stride + cur, table_rows)
            btab = btab.at[scat].set(acc_rows, mode="drop")
            seen = seen | closing
            acc = pt_select(is_new[None, :], ident, acc)
            idx = vl >> 1
            neg = (vl & 1).astype(bool)
            rows = points[idx]
            x2 = F.Fe(rows[:, :L].T, ctx.p, 4096)
            y2 = F.Fe(jnp.where(neg[:, None], rows[:, 2 * L:],
                                rows[:, L:2 * L]).T, ctx.p, 4096)
            added = ec_madd(ctx, acc, x2, y2)
            out = pt_select((key != 0)[None, :], added, acc)
            return (*_carry(out), key, seen, headk, hrows, btab), None

        init = (*_carry(ident),
                jnp.zeros((lanes_tot,), jnp.int32),
                jnp.zeros((lanes_tot,), bool),
                keys[0],
                jnp.asarray(_ident_rows(curve, lanes_tot)), btab0)
        (ax, ay, az, cur, seen, headk, hrows, btab), _ = jax.lax.scan(
            step, init, (keys, v))
        return btab

    return scan_flush


timeit(make_scan_flush_pad(512), tab.rows, db, dv,
       label="scan+flush padded-128 rows", fresh=2)
