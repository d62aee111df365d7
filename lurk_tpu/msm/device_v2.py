"""Device Pippenger MSM v2: sorted-segment bucket accumulation.

Replaces the O(N log N) EC-prefix-scan formulation (msm/pippenger.py)
with a TPU-first design whose total EC-add count is ~N per window:

  1. **Signed windows** (digits in [-2^(c-1), 2^(c-1)], negation folded
     into a per-point y/-y select — the point table carries both) halve
     the bucket count; zero digits are masked out.
  2. **Per-window device sort** of (bucket, index) — XLA's batched sort.
  3. **Lane-major chunked serial scan**: the sorted stream is reshaped
     to [LANES, CHUNK] so each vector lane owns a contiguous range of
     runs; ONE lax.scan over CHUNK steps performs a masked complete
     mixed add per lane per step (all windows ride the same lane axis).
     A run that closes after another run already closed in its lane
     must begin AND end inside that lane, so it exists in no other lane
     and within a step distinct lanes flush distinct buckets: those
     accumulators are scattered straight into the bucket table,
     provably collision-free. Each lane's first-closing and last
     (still-open) runs are emitted as boundary records instead.
  4. **Boundary combine**: the 2*LANES boundary records per window are
     bucket-sorted by construction; a log-depth segmented inclusive
     scan (key-equality Hillis-Steele over masked complete adds)
     reduces runs that straddle lanes; last-of-segment entries scatter
     into the table (disjoint from step-3 writes: a straddling run
     never interior-flushes).
  5. **Grouped bucket reduction**: sum_b b*B_b via the running-sum
     identity vectorized over [n_win*GROUPS] lanes with g serial steps;
     group totals combine through one batched identity-padded tree and
     a bit-decomposed Horner; windows combine with a masked parallel
     doubling ladder.

All loop bodies are traced once (lax.scan / fori_loop) and all EC
arithmetic is the complete-formula fe12/ec12 layer: branchless,
identity-safe, no data-dependent control flow anywhere.

Reference role: arecibo's Pippenger MSM behind Nova's Pedersen
commitments (SURVEY §2.3-2.4; reference Cargo.toml:128). Oracle:
lurk_tpu.curves.weierstrass.Curve.pippenger.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.weierstrass import Affine, Curve
from . import ec12 as E
from . import fe12 as F
from .ec12 import Pt, ec_add, ec_madd, pt_select

DEFAULT_C = 16


def _cfg(c_bits: int):
    """(n_win, n_buckets, group_g, groups) for a window width.

    c=16: 16 windows, 2^15 signed buckets (big 138 MB table, fewest
    scan madds); c=12: 22 windows, 2^11 buckets (12 MB table — the
    in-scan scatter and the bucket reduction get ~16x smaller for
    +37% scan madds); c=8: 32 windows (CPU-test size)."""
    assert c_bits in (8, 12, 16)
    n_win = -(-256 // c_bits)
    n_buckets = 1 << (c_bits - 1)
    g = {8: 16, 12: 16, 16: 64}[c_bits]
    return n_win, n_buckets, g, n_buckets // g


# ---------------------------------------------------------------------------
# host-side digit decomposition
# ---------------------------------------------------------------------------


def signed_digits(scalars: Sequence[int], order: int, c_bits: int):
    """[n_win, n] int32 bucket ids (0 = skip) and packed (idx<<1)|neg.

    The TOP window stays unsigned (its digit + carry always fits the
    [0, 2^(c-1)] bucket range for <=255-bit orders — e.g. Pallas' top
    16-bit digit can be exactly 2^14, where a signed fold would need a
    17th window). Host oracle for the device-side digitizer."""
    from ..native import fastpack
    n_win, _, _, _ = _cfg(c_bits)
    n = len(scalars)
    buf = fastpack.pack_ints([int(s) % order for s in scalars])
    if c_bits == 12:
        raw = _digits12(np.frombuffer(buf, dtype=np.uint8)
                        .reshape(n, 32))
    else:
        dt = "<u2" if c_bits == 16 else np.uint8
        raw = np.frombuffer(buf, dtype=dt).reshape(n, n_win) \
            .astype(np.int32)
    buckets = np.zeros((n_win, n), dtype=np.int32)
    negidx = np.zeros((n_win, n), dtype=np.int32)
    idx2 = np.arange(n, dtype=np.int32) << 1
    carry = np.zeros(n, dtype=np.int32)
    half, full = 1 << (c_bits - 1), 1 << c_bits
    for w in range(n_win):
        d = raw[:, w] + carry
        if w == n_win - 1:
            neg = np.zeros(n, dtype=bool)
        else:
            neg = d > half
        dd = np.where(neg, d - full, d)
        carry = neg.astype(np.int32)
        buckets[w] = np.abs(dd)
        negidx[w] = idx2 | (dd < 0)
    assert int(buckets[n_win - 1].max(initial=0)) <= half, \
        "top-window digit exceeded the bucket range"
    return buckets, negidx


def pack_scalar_words(scalars: Sequence[int], order: int) -> np.ndarray:
    """[n, 8] int32 little-endian 32-bit words (device digitizer
    input — 4x less tunnel traffic than the [n_win, n] digit pair).

    PackedVec fast path: the prover's witness vectors are already
    4x64-limb LE canonical (< p == curve order) — a dtype view, no
    int round-trip (saves ~290 ms per 2^20 commit)."""
    from ..native.r1cs import PackedVec
    if isinstance(scalars, PackedVec):
        assert scalars.p == order, "PackedVec modulus != curve order"
        return scalars.arr.view("<u4").reshape(len(scalars), 8) \
            .astype(np.int32)
    from ..native import fastpack
    buf = fastpack.pack_ints([int(s) % order for s in scalars])
    return np.frombuffer(buf, dtype="<u4").reshape(len(scalars), 8) \
        .astype(np.int32)


def _device_digits(words: jnp.ndarray, c_bits: int):
    """Device-side signed digitizer: [n, 8] int32 words -> (buckets,
    negidx) [n_win, n] int32, matching signed_digits bit-exactly."""
    n_win, _, _, _ = _cfg(c_bits)
    n = words.shape[0]
    uw = words.astype(jnp.uint32)       # logical shifts, not arithmetic
    if c_bits == 16:
        raw = jnp.stack(
            [(uw[:, w // 2] >> (16 * (w % 2))) & 0xFFFF
             for w in range(n_win)], axis=0)
    elif c_bits == 12:
        cols = []
        for w in range(n_win):
            off = 12 * w
            word, sh = off // 32, off % 32
            d = (uw[:, word] >> sh) & 0xFFF
            if sh > 20 and word + 1 < 8:
                d = d | ((uw[:, word + 1] << (32 - sh)) & 0xFFF)
            cols.append(d)
        raw = jnp.stack(cols, axis=0)
    else:
        raw = jnp.stack(
            [(uw[:, w // 4] >> (8 * (w % 4))) & 0xFF
             for w in range(n_win)], axis=0)
    raw = raw.astype(jnp.int32)
    half, full = 1 << (c_bits - 1), 1 << c_bits
    idx2 = jnp.arange(n, dtype=jnp.int32) << 1

    def step(carry, inp):
        raw_w, is_top = inp
        d = raw_w + carry
        neg = (d > half) & ~is_top
        dd = jnp.where(neg, d - full, d)
        return neg.astype(jnp.int32), (jnp.abs(dd),
                                       idx2 | (dd < 0))

    is_top = jnp.zeros((n_win, 1), dtype=bool).at[n_win - 1].set(True)
    _, (buckets, negidx) = jax.lax.scan(
        step, jnp.zeros((n,), jnp.int32), (raw, is_top))
    return buckets, negidx


def _digits12(bytes_le: np.ndarray) -> np.ndarray:
    """[n, 32] uint8 LE -> [n, 22] int32 12-bit digits (top window is
    the 4 bits 252..255; scalars < 2^256)."""
    b = bytes_le.astype(np.int32)
    cols = []
    for w in range(22):
        off = 12 * w
        byte, sh = off // 8, off % 8
        if byte + 1 < 32:
            d = (b[:, byte] >> sh) | (b[:, byte + 1] << (8 - sh))
        else:
            d = b[:, byte] >> sh
        cols.append(d & 0xFFF)
    return np.stack(cols, axis=1)


# ---------------------------------------------------------------------------
# device helpers
# ---------------------------------------------------------------------------


def _flat(pt: Pt) -> jnp.ndarray:
    """Pt batch [22, B] -> rows [B, 66]."""
    return jnp.concatenate(
        [pt.x.cols.T, pt.y.cols.T, pt.z.cols.T], axis=1)


def _unflat(curve: Curve, rows: jnp.ndarray) -> Pt:
    L = F.L
    return E.assume_pt(curve, rows[:, :L].T, rows[:, L:2 * L].T,
                       rows[:, 2 * L:].T)


def _ident_rows(curve: Curve, n: int) -> np.ndarray:
    ctx = E.ec_ctx(curve)
    row = np.zeros((1, 3 * F.L), dtype=np.int32)
    row[0, F.L:2 * F.L] = F._limb_col(ctx.r_mod_p).ravel()
    return np.broadcast_to(row, (n, 3 * F.L)).copy()


def _carry(pt: Pt):
    return (pt.x.cols, pt.y.cols, pt.z.cols)


def _tree_sum_flat(curve: Curve, rows: jnp.ndarray, blocks: int,
                   width: int) -> jnp.ndarray:
    """[blocks*width, 66] -> [blocks, 66]: per-block identity-padded
    pairwise tree at fixed shape (body traced once). width: pow2."""
    ctx = E.ec_ctx(curve)
    assert width & (width - 1) == 0
    if width == 1:
        return rows
    levels = width.bit_length() - 1
    ident = jnp.asarray(_ident_rows(curve, blocks * width // 2))

    def body(_, r):
        r3 = r.reshape(blocks, width // 2, 2, 66)
        a = _unflat(curve, r3[:, :, 0].reshape(-1, 66))
        b = _unflat(curve, r3[:, :, 1].reshape(-1, 66))
        s = _flat(ec_add(ctx, a, b)).reshape(blocks, width // 2, 66)
        return jnp.concatenate(
            [s, ident.reshape(blocks, width // 2, 66)],
            axis=1).reshape(blocks * width, 66)

    out = jax.lax.fori_loop(0, levels, body, rows)
    return out.reshape(blocks, width, 66)[:, 0]


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _msm_kernel(curve: Curve, lanes_w: int, c_bits: int,
                points, words, combine_windows: bool = True):
    """points: [n, 66] int32; words: [n, 8] int32 scalar words
    (digitized on device). Returns a [1, 66] row (projective,
    Montgomery).

    v3 bucket accumulation (r5): the scan no longer carries or
    scatters into the bucket table — TPUs hate per-lane scatters
    (measured +1.24 s/2^20, and the in-scan scatter was also what made
    the XLA:CPU compile pathological). Instead every step EMITS its
    (closing key, flush flag, accumulator row) densely as scan outputs
    (int16 rows — accumulator columns are bounded <~9.2k by
    ec12.accum_bounds; sequential HBM writes are ~free), and a gather
    post-pass rebuilds the table: each bucket's unique interior-close
    position is computable from the sorted keys alone (hi_b =
    searchsorted(keys, b, 'right'); close at step hi_b%chunk of lane
    hi_b//chunk), so the table is one validated gather — no scatter."""
    ctx = E.ec_ctx(curve)
    n_win, n_buckets, group_g, groups = _cfg(c_bits)
    stride = n_buckets + 1
    n = points.shape[0]
    chunk = n // lanes_w
    lanes_tot = n_win * lanes_w

    # 0. device-side signed digitization (saves 4x tunnel traffic)
    buckets, negidx = _device_digits(words, c_bits)

    # 1-2. sort each window by bucket id
    keys_sorted, vals = jax.lax.sort_key_val(buckets, negidx, dimension=1)
    keys = keys_sorted.reshape(n_win, lanes_w, chunk).transpose(2, 0, 1) \
                      .reshape(chunk, lanes_tot)
    vals = vals.reshape(n_win, lanes_w, chunk).transpose(2, 0, 1) \
               .reshape(chunk, lanes_tot)

    table_rows = n_win * stride
    ident = E.identity(ctx, lanes_tot)
    L = F.L
    for _, cmax in E.accum_bounds(curve):
        assert cmax < (1 << 15), "int16 emission requires cmax < 2^15"

    # 3. chunked serial scan with dense flush emission
    def step(carry, inp):
        (ax, ay, az, cur, seen, headk, hrows) = carry
        key, vl = inp
        acc = E.assume_pt(curve, ax, ay, az)
        is_new = key != cur
        closing = is_new & (cur != 0)
        rec_head = closing & ~seen
        headk = jnp.where(rec_head, cur, headk)
        acc_rows = _flat(acc)
        hrows = jnp.where(rec_head[:, None], acc_rows, hrows)
        flush = closing & seen
        seen = seen | closing
        acc = pt_select(is_new[None, :], ident, acc)
        idx = vl >> 1
        neg = (vl & 1).astype(bool)
        rows = points[idx]                      # [B, 66] gather
        x2 = F.Fe(rows[:, :L].T, ctx.p, 4096)
        y2 = F.Fe(jnp.where(neg[:, None], rows[:, 2 * L:],
                            rows[:, L:2 * L]).T, ctx.p, 4096)
        added = ec_madd(ctx, acc, x2, y2)
        out = pt_select((key != 0)[None, :], added, acc)
        emit = (cur, flush, acc_rows.astype(jnp.int16))
        return (*_carry(out), key, seen, headk, hrows), emit

    init = (*_carry(ident),
            jnp.zeros((lanes_tot,), jnp.int32),
            jnp.zeros((lanes_tot,), bool),
            keys[0],                              # head key := first key
            jnp.asarray(_ident_rows(curve, lanes_tot)))
    import os
    unroll = int(os.environ.get("LURK_MSM_SCAN_UNROLL", "1"))
    (ax, ay, az, cur, seen, headk, hrows), \
        (em_key, em_flush, em_rows) = jax.lax.scan(
            step, init, (keys, vals), unroll=unroll)

    # 3b. interior-table rebuild: one validated gather per bucket slot.
    # hi_b (first stream position AFTER bucket b's run) locates b's
    # unique interior close; the emitted (key, flush) pair at that
    # position validates it (mismatch => boundary-handled or empty).
    bvals = jnp.arange(1, n_buckets + 1, dtype=jnp.int32)
    hi = jax.vmap(
        lambda a: jnp.searchsorted(a, bvals, side="right"))(keys_sorted)
    hi = hi.astype(jnp.int32)                    # [n_win, n_buckets]
    step_idx = hi % chunk
    lane_loc = jnp.minimum(hi // chunk, lanes_w - 1)
    valid = (hi < n) & (step_idx != 0)
    glane = (jnp.arange(n_win, dtype=jnp.int32)[:, None] * lanes_w
             + lane_loc)
    flat = step_idx * lanes_tot + glane          # [n_win, n_buckets]
    g_key = em_key.reshape(-1)[flat]
    g_flush = em_flush.reshape(-1)[flat]
    g_rows = em_rows.reshape(-1, 66)[flat]       # int16
    use = valid & g_flush & (g_key == bvals[None, :])
    id_row = jnp.asarray(_ident_rows(curve, 1))[0]
    slab_rows = jnp.where(use[..., None], g_rows.astype(jnp.int32),
                          id_row[None, None, :])  # [n_win, n_buckets, 66]
    btab = jnp.concatenate(
        [jnp.broadcast_to(id_row[None, None, :], (n_win, 1, 66)),
         slab_rows], axis=1).reshape(table_rows, 66)
    btab = jnp.concatenate([btab, id_row[None, :]], axis=0)

    # 4. boundary combine: interleave (head, tail) per lane (bucket-
    # sorted), segmented inclusive sum, last-of-segment scatter.
    tail_rows = _flat(E.assume_pt(curve, ax, ay, az))
    m = 2 * lanes_w
    bk = jnp.stack([headk, cur], axis=1) \
        .reshape(n_win, lanes_w, 2).reshape(n_win * m)
    brows = jnp.stack([hrows, tail_rows], axis=1) \
        .reshape(n_win, lanes_w, 2, 66).reshape(n_win * m, 66)
    pos = jnp.tile(jnp.arange(m, dtype=jnp.int32), n_win)

    def seg_body(k, rb):
        rows, _ = rb
        s = jnp.int32(1) << k
        ok = pos >= s
        sk = jnp.where(ok, jnp.roll(bk, s), -1)
        sp = _unflat(curve, jnp.roll(rows, s, axis=0))
        pts = _unflat(curve, rows)
        summed = _flat(ec_add(ctx, pts, sp))
        take = (ok & (sk == bk))[:, None]
        return (jnp.where(take, summed, rows), 0)

    levels = (m - 1).bit_length()
    brows, _ = jax.lax.fori_loop(0, levels, seg_body, (brows, 0))
    nextk = jnp.where(pos < m - 1, jnp.roll(bk, -1), -1)
    last = (bk != nextk) & (bk != 0)
    wid2 = jnp.repeat(jnp.arange(n_win, dtype=jnp.int32), m)
    scat = jnp.where(last, wid2 * stride + bk, table_rows)
    btab = btab.at[scat].set(brows, mode="promise_in_bounds")

    # 5. bucket reduction: running-sum over groups (buckets 1..n_buckets
    # = groups*group_g exactly; id b = k*g + j, j in [1, g])
    slab = btab[:table_rows].reshape(n_win, stride,
                                     66)[:, 1:1 + n_buckets]
    slab = slab.reshape(n_win, groups, group_g, 66) \
               .transpose(2, 0, 1, 3).reshape(group_g, n_win * groups, 66)
    gident = E.identity(ctx, n_win * groups)

    def red_step(carry, rows):
        rx, ry, rz, tx, ty, tz = carry
        run = ec_add(ctx, E.assume_pt(curve, rx, ry, rz),
                     _unflat(curve, rows))
        tot = ec_add(ctx, E.assume_pt(curve, tx, ty, tz), run)
        return (*_carry(run), *_carry(tot)), None

    ginit = (*_carry(gident), *_carry(gident))
    (rx, ry, rz, tx, ty, tz), _ = jax.lax.scan(
        red_step, ginit, slab[::-1])
    s_rows = _flat(E.assume_pt(curve, rx, ry, rz))   # group sums S_k
    w_rows = _flat(E.assume_pt(curve, tx, ty, tz))   # in-group sums W_k

    # total_w = sum_k W_k  +  g * sum_k k*S_k (bit-decomposed Horner).
    # One batched tree handles W and every bit-plane of k at once.
    kvec = jnp.tile(jnp.arange(groups, dtype=jnp.int32), n_win)
    kbits = (groups - 1).bit_length()
    planes = [w_rows]
    id_rows = jnp.asarray(_ident_rows(curve, n_win * groups))
    for j in range(kbits):
        selj = (((kvec >> j) & 1) == 1)[:, None]
        planes.append(jnp.where(selj, s_rows, id_rows))
    stackd = jnp.concatenate(planes, axis=0)       # [(1+kbits)*nw*g, 66]
    sums = _tree_sum_flat(curve, stackd, (1 + kbits) * n_win, groups)
    w_total = _unflat(curve, sums[:n_win])
    bitp = sums[n_win:].reshape(kbits, n_win, 66)

    def horner_bit(t, c3):
        x, y, z = c3
        acc = E.assume_pt(curve, x, y, z)
        acc = ec_add(ctx, acc, acc)
        rowj = jax.lax.dynamic_index_in_dim(bitp, kbits - 1 - t, axis=0,
                                            keepdims=False)
        acc = ec_add(ctx, acc, _unflat(curve, rowj))
        return _carry(acc)

    top = _unflat(curve, bitp[kbits - 1])
    hc = jax.lax.fori_loop(1, kbits, horner_bit, _carry(top))
    acc_bit = E.assume_pt(curve, *hc)

    def dbl_body(_, c3):
        pt = E.assume_pt(curve, *c3)
        return _carry(ec_add(ctx, pt, pt))

    gshift = group_g.bit_length() - 1              # * g
    acc_bit = E.assume_pt(curve, *jax.lax.fori_loop(
        0, gshift, dbl_body, _carry(acc_bit)))
    per_win = ec_add(ctx, w_total, acc_bit)        # [n_win]
    if not combine_windows:
        # per-window sums only: multi-chunk callers (the CPU mesh's
        # per=64 chunk loop) sum windows across chunks host-side and
        # run ONE ladder, instead of paying the 248-serial-add ladder
        # per chunk (it dominated tiny-chunk runtime)
        return _flat(per_win)

    # 6. window combine: masked doubling ladder + tree
    wv = jnp.arange(n_win, dtype=jnp.int32)

    def ladder(t, c3):
        pt = E.assume_pt(curve, *c3)
        d = ec_add(ctx, pt, pt)
        out = pt_select((t < c_bits * wv)[None, :], d, pt)
        return _carry(out)

    lc = jax.lax.fori_loop(0, c_bits * (n_win - 1), ladder,
                           _carry(per_win))
    win_rows = _flat(E.assume_pt(curve, *lc))
    n_win_pad = 1 << (n_win - 1).bit_length()
    if n_win_pad != n_win:
        win_rows = jnp.concatenate(
            [win_rows, jnp.asarray(_ident_rows(curve,
                                               n_win_pad - n_win))])
    fin_rows = _tree_sum_flat(curve, win_rows, 1, n_win_pad)
    return fin_rows


@lru_cache(maxsize=16)
def _jit_kernel(curve: Curve, lanes_w: int, c_bits: int,
                combine_windows: bool = True):
    return jax.jit(partial(_msm_kernel, curve, lanes_w, c_bits,
                           combine_windows=combine_windows))


# ---------------------------------------------------------------------------
# host API with a cached device point table
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MsmTable:
    """Device-resident (x, y, -y) Montgomery table for a fixed base set
    (Pedersen generators are long-lived — upload once, reuse)."""

    curve: Curve
    n: int                    # padded size (power of two)
    rows: jnp.ndarray         # [n, 66] int32

    @staticmethod
    def build(curve: Curve, points: Sequence[Affine]) -> "MsmTable":
        n = max(64, 1 << (len(points) - 1).bit_length())
        rows = E.points_to_cols(curve, list(points))
        if n > len(points):
            rows = np.concatenate(
                [rows, np.zeros((n - len(points), 3 * F.L), np.int32)])
        return MsmTable(curve, n, jax.device_put(jnp.asarray(rows)))

    def msm(self, scalars: Sequence[int], lanes_w: int = 512,
            c_bits: int = DEFAULT_C) -> Affine:
        """MSM of scalars against the table's first len(scalars) points."""
        out = self.msm_async(scalars, lanes_w, c_bits)
        return E.pt_from_device(self.curve, _unflat(self.curve, out))[0]

    def msm_async(self, scalars: Sequence[int], lanes_w: int = 512,
                  c_bits: int = DEFAULT_C):
        """Dispatch without blocking; returns the device [1, 66] row."""
        n = self.n
        assert len(scalars) <= n
        words = pack_scalar_words(scalars, self.curve.order)
        if len(scalars) < n:
            words = np.concatenate(
                [words, np.zeros((n - len(scalars), 8), np.int32)])
        lanes_w = min(lanes_w, max(1, n // 2))
        fn = _jit_kernel(self.curve, lanes_w, c_bits)
        return fn(self.rows, jnp.asarray(words))


def msm_v2(curve: Curve, scalars: Sequence[int],
           points: Sequence[Affine], lanes_w: int = 512,
           c_bits: int = DEFAULT_C) -> Affine:
    """One-shot API (table built per call — prefer MsmTable for reuse)."""
    if not len(scalars):
        return None
    tab = MsmTable.build(curve, points)
    return tab.msm(list(scalars), lanes_w=lanes_w, c_bits=c_bits)
