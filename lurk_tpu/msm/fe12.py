"""Bound-tracked batched field arithmetic on signed 12-bit limb columns.

The EC-add building block for the device MSM (lurk_tpu/msm/device_v2.py).
Reuses the 12-bit carry-free limb core proven by the Poseidon kernel
(lurk_tpu/ops/nib12.py): elements are ``[22, B] int32`` little-endian
base-2^12 columns (value = sum cols[i]*2^(12*i)), batch axis on the TPU
vector lanes, variable*variable products exact in int32 with no lo/hi
split, Montgomery REDC via int8 nibble-plane MXU matmuls.

What is new versus the Poseidon kernels, driven by EC formulas:

  - **Exact static bound tracking.** Every `Fe` carries python-int
    bounds on its value (`vmax`, value always >= 0) and per-column
    interval (`cmin`, `cmax`), propagated exactly at trace time. Every
    Montgomery product asserts the REDC soundness precondition
    ``T + E < R*p`` and int32 column exactness; violations raise at
    build time. The complete EC formulas then need NO mid-formula
    canonicalization — the lazy bounds reach a fixed point well inside
    R = 2^264 (see ec12.accum_bounds).

  - **Signed borrow-free subtraction.** ``a - b`` adds the smallest
    k*p >= bound(b) and runs two signed (arithmetic-shift) carry
    passes; limbs land in [-1, 4096] with NO borrow lookahead. The
    residual -1s are tolerated by the signed product and absorbed just
    before REDC by a per-field offset ``E = k*p`` whose 44 columns are
    all >= 1 (such k exist densely at 528 bits, unlike at 264 bits
    where p's zero-limb band blocks them).

  - **Tight REDC.** One extra bin carry pass takes the unnormalized
    Montgomery ``m`` to bins <= 22 (vs the Poseidon kernels' <= 127),
    so outputs are < T/R + ~1.5p instead of < ~9p — what makes the
    EC fixed point exist.

Reference surface: the Rust ff/pasta_curves/halo2curves field backends
(/root/reference/src/field.rs, Cargo.toml:137,68) used by arecibo's
Pedersen commitments. Bit-exactness oracle: lurk_tpu.fields python ints.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..fields import FieldSpec
from ..ops import nib12 as N12

L = N12.L                  # 22 limbs
LIMB_BITS = N12.LIMB_BITS  # 12
LIMB_MASK = N12.LIMB_MASK
R_BITS = N12.R_BITS        # 264
R = 1 << R_BITS
BINS = N12.BINS            # 66
COL_BITS = 18              # REDC input column budget (f32-exact <= 23)

_MUL_OPERAND_CMAX = 6900   # 22 * 6900^2 < 2^31 and one prep pass fits


# ---------------------------------------------------------------------------
# const pool: lets a pallas kernel receive this module's embedded
# constants (REDC matrices, subtraction offsets, fe_const limb columns)
# as explicit kernel inputs. pallas_call rejects kernels that capture
# large constants; trace the EC body once in "collect" mode to gather
# the deduped numpy arrays, then re-trace inside the kernel in "replay"
# mode with the corresponding ref reads. Trace order is deterministic,
# and arrays are keyed by content, so collect and replay agree.
# ---------------------------------------------------------------------------


class ConstPool:
    def __init__(self):
        self.arrays: list = []          # deduped numpy arrays
        self._index = {}                # content key -> slot
        self.replay: Optional[list] = None

    def _key(self, arr: np.ndarray):
        return (arr.shape, str(arr.dtype), arr.tobytes())

    def get(self, arr) -> jnp.ndarray:
        a = np.asarray(arr)
        k = self._key(a)
        slot = self._index.get(k)
        if slot is None:
            assert self.replay is None, \
                "replay saw a constant absent from the collect pass"
            slot = len(self.arrays)
            self._index[k] = slot
            self.arrays.append(a)
        if self.replay is not None:
            return self.replay[slot]
        return jnp.asarray(a)


_POOL: Optional[ConstPool] = None


class const_pool:
    """Context manager: route this module's constants through `pool`
    (replay list = traced values aligned with pool.arrays)."""

    def __init__(self, pool: ConstPool, replay=None):
        self.pool = pool
        self.replay = replay

    def __enter__(self):
        global _POOL
        self._prev = _POOL
        self.pool.replay = self.replay
        _POOL = self.pool
        return self.pool

    def __exit__(self, *exc):
        global _POOL
        _POOL = self._prev
        self.pool.replay = None


def fetch_const(arr) -> jnp.ndarray:
    if _POOL is None:
        return jnp.asarray(arr)
    return _POOL.get(arr)


def _limb_col(v: int, n: int = L) -> np.ndarray:
    return np.array([(v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)],
                    dtype=np.int32).reshape(n, 1)


def _min_limb(v: int, n: int) -> int:
    return min((v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n))


# ---------------------------------------------------------------------------
# per-field context
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Fe12Ctx:
    """REDC matrices (tight bin bound), subtraction offsets, and the
    44-column positive offset E for signed REDC inputs."""

    nf: N12.Nib12Field
    mats: tuple                         # redc matrices for COL_BITS
    m_value_max: int                    # value bound of unnormalized m
    mp_col_max: int                     # max merged (m*p)>>R column bound
    # signed-product support: a 22x22-limb product has 43 columns; after
    # signed passes the spill column c43 is in [-1, 1] and is folded
    # back as (c43+1)*W - W with W = 2^516 mod p; the -W rides in
    # F = k*p - W, a 43-column offset with every limb in [1, 4095]
    # (~2^505 — negligible against the R*p Montgomery budget).
    w_value: int
    w_limbs: np.ndarray                 # [L, 1] int32
    f_value: int
    f_limbs: np.ndarray                 # [2L-1, 1] int32

    @property
    def p(self) -> int:
        return self.nf.modulus

    def sub_offset(self, vmax: int) -> Tuple[int, np.ndarray]:
        """Smallest k*p >= vmax (as value + [L,1] int32 limb column)."""
        k = -(-vmax // self.p)
        return k * self.p, _limb_col(k * self.p)


@lru_cache(maxsize=None)
def fe12_ctx(spec: FieldSpec) -> Fe12Ctx:
    nf = N12.nib12_field(spec)
    p = nf.modulus
    m_mat = nf.m_matrix(COL_BITS)
    nibs = -(-COL_BITS // 4)
    plane_bound = np.full((nibs * L,), 15, dtype=np.int64)
    top_bits = COL_BITS - 4 * (nibs - 1)
    plane_bound[(nibs - 1) * L:] = (1 << top_bits) - 1
    row_bound = int((m_mat.astype(np.int64) @ plane_bound).max())
    # carry passes until bins <= 22: one past int8 range costs little
    # and tightens the output bound from ~9p to ~1.5p.
    n_passes, b = 0, row_bound
    while b > 22:
        b = 15 + b // 16
        n_passes += 1
    m_value_max = b * ((1 << (4 * BINS)) - 1) // 15
    ph = nf.p_hi_mat.astype(np.int64)
    mp_rows = ph.sum(axis=1) * b
    mp_cols = mp_rows[:L].copy()
    for s in range(1, N12.NIB):
        mp_cols += mp_rows[s * L:(s + 1) * L] << (4 * s)
    w_value = (1 << (LIMB_BITS * (2 * L - 1))) % p   # 2^516 mod p
    base = ((1 << (LIMB_BITS * (2 * L - 2))) * 3 + w_value) // p
    k = base
    while True:
        f = k * p - w_value
        if f > 0 and _min_limb(f, 2 * L - 1) >= 1 and \
                f >> (LIMB_BITS * (2 * L - 1)) == 0:
            break
        k += 1
        assert k - base < 100000, "no 43-column positive k*p - W"
    mats = (m_mat, nf.p_hi_mat, nf.w_row(COL_BITS).reshape(L, 1),
            nf.u_row.reshape(BINS, 1), n_passes)
    return Fe12Ctx(nf=nf, mats=mats, m_value_max=m_value_max,
                   mp_col_max=int(mp_cols.max()),
                   w_value=w_value, w_limbs=_limb_col(w_value),
                   f_value=f, f_limbs=_limb_col(f, 2 * L - 1))


# ---------------------------------------------------------------------------
# Fe: a batched field element with exact static bounds
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Fe:
    """cols: [22, B] int32 (None for bounds-only dry runs); vmax: exact
    exclusive value bound (value >= 0 always); [cmin, cmax]: inclusive
    per-column interval."""

    cols: Optional[jnp.ndarray]
    vmax: int
    cmax: int
    cmin: int = 0


def fe_const(ctx: Fe12Ctx, value_mont: int, batch: int,
             dry: bool = False) -> Fe:
    """Broadcast constant (already in the Montgomery domain)."""
    assert 0 <= value_mont < ctx.p
    if dry:
        return Fe(None, ctx.p, LIMB_MASK)
    col = _limb_col(value_mont)
    arr = jnp.broadcast_to(fetch_const(col), (L, batch))
    return Fe(arr, ctx.p, LIMB_MASK)


def fe_add(ctx: Fe12Ctx, a: Fe, b: Fe) -> Fe:
    arr = None if a.cols is None else a.cols + b.cols
    return Fe(arr, a.vmax + b.vmax, a.cmax + b.cmax, a.cmin + b.cmin)


def _carry_interval(cmin: int, cmax: int, n: int) -> Tuple[int, int]:
    for _ in range(n):
        cmin, cmax = (cmin >> LIMB_BITS), LIMB_MASK + (cmax >> LIMB_BITS)
    return cmin, cmax


def _signed_pass(x, n: int = 1):
    """Value-preserving signed base-2^12 carry passes on [C, B] int32
    (arithmetic shift carries; two's-complement & keeps low bits >= 0)."""
    for _ in range(n):
        lo = x & LIMB_MASK
        cr = x >> LIMB_BITS
        zero = jnp.zeros((1,) + x.shape[1:], dtype=x.dtype)
        x = lo + jnp.concatenate([zero, cr[:-1]], axis=0)
    return x


def fe_carry(ctx: Fe12Ctx, a: Fe, n: int = 1) -> Fe:
    assert a.vmax <= R, "carry pass would drop a top-column carry"
    cmin, cmax = _carry_interval(a.cmin, a.cmax, n)
    arr = None if a.cols is None else _signed_pass(a.cols, n)
    return Fe(arr, a.vmax, cmax, cmin)


def fe_sub(ctx: Fe12Ctx, a: Fe, b: Fe) -> Fe:
    """a - b (mod p): add smallest k*p >= b.vmax, two signed passes."""
    q_val, q_limbs = ctx.sub_offset(b.vmax)
    vmax = a.vmax + q_val
    assert vmax <= R, "fe_sub result exceeds the representation range"
    cmin, cmax = a.cmin - b.cmax, a.cmax + LIMB_MASK - b.cmin
    assert -(1 << 30) < cmin and cmax < (1 << 30)
    cmin, cmax = _carry_interval(cmin, cmax, 2)
    assert cmin >= -1, "two signed passes should reach cmin >= -1"
    if a.cols is None:
        arr = None
    else:
        t = a.cols + fetch_const(q_limbs) - b.cols
        arr = _signed_pass(t, 2)
    return Fe(arr, vmax, cmax, cmin)


def fe_mul(ctx: Fe12Ctx, a: Fe, b: Fe) -> Fe:
    """Montgomery product a*b*R^-1 (mod p) with tight signed REDC."""
    while max(abs(a.cmin), a.cmax) > _MUL_OPERAND_CMAX:
        a = fe_carry(ctx, a, 1)
    while max(abs(b.cmin), b.cmax) > _MUL_OPERAND_CMAX:
        b = fe_carry(ctx, b, 1)
    hi_a, hi_b = max(abs(a.cmin), a.cmax), max(abs(b.cmin), b.cmax)
    assert L * hi_a * hi_b < (1 << 31), "product columns exceed int32"
    t_vmax = a.vmax * b.vmax
    t_cmax = L * max(a.cmax * b.cmax, a.cmin * b.cmin)
    t_cmin = L * min(a.cmin * b.cmax, a.cmax * b.cmin, 0)
    signed = t_cmin < 0
    # signed prep passes until columns fit COL_BITS (room for u*W + F)
    fold_max = 2 * LIMB_MASK + LIMB_MASK if signed else 0
    n_prep = 0
    while t_cmax > (1 << COL_BITS) - fold_max - 1 or \
            (signed and t_cmin < -1):
        t_cmin, t_cmax = _carry_interval(t_cmin, t_cmax, 1)
        n_prep += 1
    t_vmax_true = t_vmax + (2 * ctx.w_value + ctx.f_value if signed else 0)
    assert t_vmax_true < R * ctx.p, (
        "Montgomery precondition T < R*p violated: bounds "
        f"{a.vmax / ctx.p:.1f}p * {b.vmax / ctx.p:.1f}p")
    if signed:
        # spill column c43 = (value - lower)/2^516 needs c43 <= 1 for
        # the {0,1,2} fold (lower cols can lend at most ~2^505)
        assert t_vmax < (1 << (LIMB_BITS * (2 * L - 1) + 1)) - \
            (1 << (LIMB_BITS * (2 * L - 2) + 1)), "spill fold out of range"
    t_lo_colmax = t_cmax + fold_max
    if a.cols is None:
        out = None
    else:
        t = N12.product_cols(a.cols, b.cols)
        t = _signed_pass(t, n_prep)
        if signed:
            # fold the spill column c43 in [-1,1] down as (c43+1)*W - W,
            # the -W pre-merged into the all-positive offset F = k*p - W
            u = t[2 * L - 1:] + 1                    # [1, B] in {0,1,2}
            t = t[:2 * L - 1] + fetch_const(ctx.f_limbs)
            # two single-axis broadcasts (sublane, then lane): Mosaic
            # cannot lower the fused [L,1]x[1,B] outer-product form
            ub = jnp.broadcast_to(u, (L, u.shape[1]))
            uw = ub * fetch_const(ctx.w_limbs)       # [L, B]
            t = jnp.concatenate([t[:L] + uw, t[L:]], axis=0)
        mm, ph, wr, ur, np_ = ctx.mats
        mats = (fetch_const(mm), fetch_const(ph), fetch_const(wr),
                fetch_const(ur), np_)
        out = N12.redc_cols(mats, t.astype(jnp.uint32), COL_BITS)
        out = out.astype(jnp.int32)
    out_vmax = (t_vmax_true + ctx.m_value_max * ctx.p) // R + 2
    c_bound = (t_lo_colmax >> LIMB_BITS) + 2
    fe = Fe(out, out_vmax, ctx.mp_col_max + t_lo_colmax + c_bound, 0)
    return fe_carry(ctx, fe, 1)                     # cols -> ~5.2k


def fe_select(mask, a: Fe, b: Fe) -> Fe:
    """mask ? a : b. mask broadcasts [1, B] (or [B]) over limbs."""
    arr = None
    if a.cols is not None:
        m = mask if getattr(mask, "ndim", 1) == 2 else mask[None, :]
        arr = jnp.where(m, a.cols, b.cols)
    return Fe(arr, max(a.vmax, b.vmax), max(a.cmax, b.cmax),
              min(a.cmin, b.cmin))


# ---------------------------------------------------------------------------
# host conversions
# ---------------------------------------------------------------------------


def to_mont_cols(ctx: Fe12Ctx, values) -> np.ndarray:
    """python ints -> [22, n] int32 canonical Montgomery columns.

    Bulk path via fastpack + vectorized 12-bit digit extraction (the
    per-value python limb loop cost ~40 s per 2^20-point table)."""
    mont = [(int(v) << R_BITS) % ctx.p for v in values]
    try:
        from ..native import fastpack
        buf = fastpack.pack_ints(mont)
    except Exception:
        return ctx.nf.from_ints(mont).astype(np.int32)
    b = np.frombuffer(buf, dtype=np.uint8).reshape(len(mont), 32) \
        .astype(np.int32)
    cols = np.empty((L, len(mont)), dtype=np.int32)
    for i in range(L):
        off = LIMB_BITS * i
        byte, sh = off // 8, off % 8
        d = b[:, byte] >> sh
        if byte + 1 < 32:
            d = d | (b[:, byte + 1] << (8 - sh))
        if sh > 4 and byte + 2 < 32:
            d = d | (b[:, byte + 2] << (16 - sh))
        cols[i] = d & LIMB_MASK
    return cols


def to_ints(arr: np.ndarray) -> list:
    """[22, n] (possibly signed) columns -> python ints."""
    a = np.asarray(arr).astype(object)
    out = []
    for j in range(a.shape[-1]):
        v = 0
        for i in range(a.shape[-2] - 1, -1, -1):
            v = v * (LIMB_MASK + 1) + int(a[i, j])
        out.append(v)
    return out


def from_device(ctx: Fe12Ctx, fe: Fe) -> list:
    """Fe batch -> canonical python ints (host-side mod p)."""
    rinv = pow(R, ctx.p - 2, ctx.p)
    return [v * rinv % ctx.p for v in to_ints(np.asarray(fe.cols))]
