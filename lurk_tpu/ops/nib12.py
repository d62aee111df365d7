"""12-bit-limb variant of the carry-free nibble core (ops.nibbles).

Same architecture — int8 nibble-plane MXU matmuls for constants,
redundant columns between rounds, exact f32 carry-out REDC — but limbs
are 12 bits (22 limbs, R = 2^264, 66 4-bit bins, 3 nibbles/limb).

Why 12 bits: the S-box's variable*variable multiplies are the measured
VPU bottleneck of the 16-bit kernel (CLAUDE.md ceiling analysis). With
12-bit limbs

  - products are <= (2^12-1)^2 < 2^24, so a whole column sum
    (<= 2*22 terms, < 2^29.5) accumulates EXACTLY in uint32 with NO
    per-product lo/hi split — square_cols/product_cols drop the mask/
    shift/double-placement scaffolding that dominates their cost;
  - normalize needs NO Kogge-Stone: three parallel base-2^12 carry
    passes bound limbs by 2^12 (4096 inclusive), which the squares
    tolerate (44 * 2^24 < 2^31), so the log-depth carry-lookahead
    (most of normalize16's cycles) disappears.

Bit-exactness oracle: lurk_tpu.fields (python ints). Reference
functional surface: the Rust ff/pasta_curves crates
(/root/reference/src/field.rs); TPU-first design, not a port.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..fields import FieldSpec
from . import nibbles as NB

L = 22                     # 12-bit limbs per element (R = 2^264)
LIMB_BITS = 12
LIMB_MASK = (1 << LIMB_BITS) - 1
R_BITS = L * LIMB_BITS     # 264
NIB = 3                    # nibbles per 12-bit column
BINS = L * NIB             # 66 4-bit bins per element


def _int_to_limbs(v: int, n: int = L) -> np.ndarray:
    return np.array([(v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)],
                    dtype=np.uint32)


def plane_weights(n_cols: int, nibs: int):
    """Weights of the cols_to_planes layout: row r = k*n_cols + i
    <-> bit 12*i + 4*k (12-bit columns)."""
    return [LIMB_BITS * i + 4 * k for k in range(nibs)
            for i in range(n_cols)]


def smajor_weights(n_limbs: int = L, base_bit: int = 0):
    """s-major bin layout: row (s*n_limbs + i) <-> bit
    base_bit + 12*i + 4*s (merge = 3 contiguous row slices)."""
    return [base_bit + LIMB_BITS * i + 4 * s
            for s in range(NIB) for i in range(n_limbs)]


@dataclasses.dataclass(frozen=True)
class Nib12Field:
    spec: FieldSpec
    nprime: int                # -p^-1 mod 2^264
    r2: int                    # R^2 mod p
    r_mod_p: int
    p_limbs: np.ndarray        # [L]
    u_row: np.ndarray          # [BINS] f32: m-bin weights in carry-out
    p_hi_mat: np.ndarray       # [BINS, BINS] int8 s-major rows

    @property
    def modulus(self) -> int:
        return self.spec.modulus

    def to_mont_int(self, v: int) -> int:
        return (v << R_BITS) % self.modulus

    def from_ints(self, values: Sequence[int]) -> np.ndarray:
        out = np.zeros((L, len(values)), dtype=np.uint32)
        for j, v in enumerate(values):
            out[:, j] = _int_to_limbs(v % self.modulus)
        return out

    def to_ints(self, arr: np.ndarray) -> list:
        a = np.asarray(arr).astype(object)
        a = a.reshape(-1, a.shape[-2], a.shape[-1])
        res = []
        for blk in a:
            for j in range(blk.shape[-1]):
                v = 0
                for i in range(blk.shape[-2] - 1, -1, -1):
                    v = (v << LIMB_BITS) | int(blk[i, j])
                res.append(v)
        return res

    def m_matrix(self, col_bits: int) -> np.ndarray:
        nibs = -(-col_bits // 4)
        return NB.toeplitz_nib(self.nprime, plane_weights(L, nibs),
                               NB.bin_weights(BINS))

    def w_row(self, col_bits: int) -> np.ndarray:
        assert col_bits <= 23, "T cols must stay f32-exact for carry-out"
        w = np.zeros((L,), dtype=np.float32)
        for i in range(L):
            e = LIMB_BITS * i - R_BITS
            if e >= -40:
                w[i] = np.float32(2.0 ** e)
        return w


@lru_cache(maxsize=None)
def nib12_field(spec: FieldSpec) -> Nib12Field:
    p = spec.modulus
    assert p.bit_length() <= 255
    r = 1 << R_BITS
    nprime = (-pow(p, -1, r)) % r
    u = np.zeros((BINS,), dtype=np.float32)
    for q in range(BINS):
        num = (p << (4 * q)) % r
        val = num / float(r)
        u[q] = np.float32(val) if val >= 2.0 ** -40 else np.float32(0.0)
    p_hi = NB.toeplitz_nib(p, NB.bin_weights(BINS),
                           smajor_weights(L, R_BITS))
    return Nib12Field(
        spec=spec, nprime=nprime, r2=(r * r) % p, r_mod_p=r % p,
        p_limbs=_int_to_limbs(p), u_row=u, p_hi_mat=p_hi)


# ---------------------------------------------------------------------------
# in-kernel helpers ([rows, B] arrays; Mosaic-safe ops only)
# ---------------------------------------------------------------------------


def limbs_carry_pass(cols, n: int = 1):
    """Parallel base-2^12 carry passes on [C, B] uint32 columns."""
    for _ in range(n):
        cols = (cols & LIMB_MASK) + NB.shift_rows_down(cols >> LIMB_BITS)
    return cols


def normalize(cols, passes: int = 3):
    """[L, B] uint32 columns (value < 2^264, cols < 2^30) -> limbs
    <= 2^12 + eps. No carry-lookahead. With the default 3 passes,
    cols < 2^30 -> <= 4095+2^18 -> <= 4095+2^6 -> <= 4096. Callers
    whose columns are < 2^26 may pass passes=2 (limbs <= 4100) — the
    squares/products stay uint32-exact for limbs <= ~6000
    (2 * 22 * 6000^2 < 2^31)."""
    return limbs_carry_pass(cols, passes)


def square_cols(a):
    """[L, B] limbs <= 2^12 -> [2L, B] base-2^12 column sums of a^2
    (each < 2^30; EXACT in uint32, no product splitting).
    Symmetry-halved: off-diagonal products once, doubled."""
    rows = 2 * L
    b_ = a.shape[1]
    acc = None
    for i in range(L):
        prod = a[i:i + 1] * a[i:]              # [L-i, B] <= 2^24
        if prod.shape[0] > 1:
            prod = jnp.concatenate([prod[:1], prod[1:] << 1], axis=0)
        contrib = NB._place_rows(prod, 2 * i, rows, b_, a.dtype)
        acc = contrib if acc is None else acc + contrib
    return acc


def product_cols(a, b):
    """[L, B] x [L, B] limbs <= 2^12 -> [2L, B] column sums of a*b
    (each < 2^29, exact in uint32)."""
    rows = 2 * L
    b_ = a.shape[1]
    acc = None
    for i in range(L):
        prod = a[i:i + 1] * b                  # [L, B]
        contrib = NB._place_rows(prod, i, rows, b_, a.dtype)
        acc = contrib if acc is None else acc + contrib
    return acc


def cols_to_planes(cols, col_bits: int):
    """[C, B] uint32 (< 2^col_bits) -> [nibs*C, B] int8 nibble planes
    (same layout rule as nibbles.cols_to_planes)."""
    return NB.cols_to_planes(cols, col_bits)


# square/product column sums are < 2^29.5 — above the f32 carry-out's
# 2^23 exactness bound — so one value-preserving base-2^12 pass over the
# FULL [2L, B] product (the top column is <= 1, no carry escapes) brings
# t_lo under 2^18 ahead of REDC:
SQ_COL_BITS = 18


def prep_product(t_cols):
    """One carry pass on a square/product's [2L, B] columns: cols
    <= 4095 + 2^17.5 < 2^18, ready for redc_cols(..., SQ_COL_BITS)."""
    return limbs_carry_pass(t_cols, 1)


def merge_smajor(rows_u32, n_limbs: int = L):
    """[NIB*n_limbs, B] s-major rows (row s*n+i weight 12i+4s) ->
    [n_limbs, B] base-2^12 columns. Caller bounds sums < 2^32."""
    out = rows_u32[:n_limbs]
    for s in range(1, NIB):
        out = out + (rows_u32[s * n_limbs:(s + 1) * n_limbs] << (4 * s))
    return out


def carry_out_f32(t_lo_weighted_f32, m_bins, u_row_col):
    """Same construction as nibbles.carry_out_f32 (weights are 12-bit
    variants, supplied by the caller)."""
    return NB.carry_out_f32(t_lo_weighted_f32, m_bins, u_row_col)


def redc_cols(mats, t_cols, col_bits: int):
    """Carry-free REDC of T (base-2^12 columns, [C, B], C <= 2L).

    If col_bits > 23 the caller must carry-pass t_lo first; here we
    require col_bits <= 23 (f32-exact carry-out). Returns [L, B] uint32
    columns === T*R^-1 (mod p), value < ~9p, cols < 2^26."""
    m_mat, p_hi, w_row, u_row, n_passes = mats
    t_lo = t_cols[:L]
    planes = cols_to_planes(t_lo, col_bits)
    m_bins = NB.int8_matmul(m_mat, planes).astype(jnp.uint32)
    m_bins = NB.bins_carry_pass(m_bins, n_passes)
    mp_hi = NB.int8_matmul(
        p_hi, m_bins.astype(jnp.int32).astype(jnp.int8)).astype(jnp.uint32)
    out = merge_smajor(mp_hi)
    tl_f = t_lo.astype(jnp.int32).astype(jnp.float32) * w_row
    c = carry_out_f32(tl_f, m_bins, u_row)
    if t_cols.shape[0] > L:
        t_hi = t_cols[L:]
        if t_hi.shape[0] < L:
            t_hi = NB._place_rows(t_hi, 0, L, t_hi.shape[1], t_hi.dtype)
        out = out + t_hi[:L]
    return jnp.concatenate([out[:1] + c, out[1:]], axis=0)


def m_passes_for(m_rows: np.ndarray) -> int:
    """Carry passes to bring the m-bin matmul output under int8 range,
    from the EXACT per-row digit sums (input planes are <= 15), rather
    than the loose 225*K worst case — usually saves a pass."""
    bound = int(m_rows.astype(np.int64).sum(axis=1).max()) * 15
    return NB.carry_passes_for(max(bound, 1))


def redc_mats_host(nf: Nib12Field, col_bits: int):
    m_mat = nf.m_matrix(col_bits)
    return (m_mat, nf.p_hi_mat,
            nf.w_row(col_bits).reshape(L, 1),
            nf.u_row.reshape(BINS, 1), m_passes_for(m_mat))


def sub_const_ks(limbs, const_limbs: np.ndarray):
    """Exact-limb subtraction of a constant with Kogge-Stone borrow
    lookahead (12-bit analogue of nibbles.sub_const_ks; used only in
    the final canonicalization, not the hot loop)."""
    comp = [(LIMB_MASK - int(c)) for c in const_limbs]
    comp_arr = [limbs[i:i + 1] + comp[i] for i in range(L)]
    v = jnp.concatenate(comp_arr, axis=0)
    v = jnp.concatenate([v[:1] + 1, v[1:]], axis=0)
    lo = v & LIMB_MASK
    g = v >> LIMB_BITS
    pr = (lo == LIMB_MASK).astype(jnp.uint32)
    d = 1
    while d < L:
        g = g | (pr & NB.shift_rows_down(g, d))
        pr = pr & NB.shift_rows_down(pr, d)
        d *= 2
    diff = (lo + NB.shift_rows_down(g)) & LIMB_MASK
    carry_out = g[L - 1:L]
    return diff, 1 - carry_out


def cond_sub_const(limbs, const_limbs: np.ndarray):
    diff, under = sub_const_ks(limbs, const_limbs)
    return jnp.where(under != 0, limbs, diff)


def normalize_exact(cols):
    """Exact 12-bit limbs (strict < 2^12): three passes + Kogge-Stone
    (needed only before canonical digest extraction)."""
    v = limbs_carry_pass(cols, 2)
    lo = v & LIMB_MASK
    g = v >> LIMB_BITS
    pr = (lo == LIMB_MASK).astype(jnp.uint32)
    d = 1
    while d < L:
        g = g | (pr & NB.shift_rows_down(g, d))
        pr = pr & NB.shift_rows_down(pr, d)
        d *= 2
    return (lo + NB.shift_rows_down(g)) & LIMB_MASK
