"""Carry-free nibble-plane limb core for ~255-bit fields (int8 MXU).

Third-generation TPU limb core (after ops.limbs: pure-VPU 16x16, and
ops.limbs17: bf16 8-bit digit planes). Two structural advances:

1. **int8 nibble planes.** Constants are decomposed into base-16 digits
   (<= 15) and variables into 4-bit nibble planes (<= 15 per plane, or
   wider "bin" planes up to 127), so every constant multiply is an
   int8 x int8 -> int32 MXU matmul. int32 accumulation is exact for ANY
   contraction length used here (15*127*K < 2^31 needs K < 1.1M), which
   removes limbs17's 257-term f32 chunking entirely: a whole Poseidon
   MDS layer (or a folded partial-round span) fuses into ONE matmul.

2. **Carry-free dataflow.** Values travel as redundant base-2^16
   "columns" ([C, B] uint32, value = sum cols[i]*2^16i) or base-16
   "bins". Montgomery reduction never normalizes:

     - m = T_lo * N' mod R is used UNNORMALIZED: REDC stays correct for
       any m === T*N' (mod R); two data-independent parallel carry
       passes bring its bins under int8 range, and the output bound
       relaxes from <2p to a wider lazy domain [0, ~9p) — still far
       inside R = 2^272 (p < 2^255 leaves 17 bits of slack).
     - the low half of T + m*p is a known-exact multiple of R; its
       quotient (the "carry-out" into the high half) is recovered with
       an exact-rounding f32 weighted row-sum instead of a 17-step
       sequential carry chain. Error budget < 0.5 by construction;
       weights below 2^-40 are clamped to zero (their total mass is
       < 2^-20), which also keeps every weight out of f32 subnormals.

   Sequential carries survive in exactly one place: ahead of the VPU
   S-box squarings, which need exact 16-bit limbs. normalize() does two
   parallel passes then Kogge-Stone carry-lookahead (log-depth, all
   dense [17, B] ops) — no per-limb ripple anywhere.

Everything is layout-disciplined for Mosaic: arrays are [rows, B] with
rows = limb/bin/plane axis (sublanes) and B = batch (lanes); only
concat/slice/shift/mask ops on the row axis, no data-moving reshapes,
no strided row slicing (matrices emit rows pre-permuted "s-major" so
bin->column merges are contiguous slices).

Bit-exactness oracle: lurk_tpu.fields (python ints). Reference
functional surface: the Rust ff/pasta_curves crates
(/root/reference/src/field.rs); the design is TPU-first, not a port.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FieldSpec

L = 17                     # 16-bit limbs per element (R = 2^272)
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
R_BITS = L * LIMB_BITS     # 272
NIB = 4                    # nibbles per 16-bit column
BINS = L * NIB             # 68 4-bit bins per element

MAX_PLANE_VAL = 127        # int8 positive range for matmul inputs


def _int_to_limbs(v: int, n: int = L) -> np.ndarray:
    return np.array([(v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)],
                    dtype=np.uint32)


def nibbles_of(v: int, n: int) -> List[int]:
    return [(v >> (4 * i)) & 0xF for i in range(n)]


# ---------------------------------------------------------------------------
# host-side constant matrix builders
# ---------------------------------------------------------------------------


def plane_weights(n_cols: int, nibs: int) -> List[int]:
    """Bit weights of the plane layout emitted by cols_to_planes:
    row r = k*n_cols + i  <->  bit weight 16*i + 4*k."""
    return [16 * i + 4 * k for k in range(nibs) for i in range(n_cols)]


def bin_weights(n_bins: int, base_bit: int = 0) -> List[int]:
    """Weights of a bin-major layout: row r <-> bit base_bit + 4*r."""
    return [base_bit + 4 * r for r in range(n_bins)]


def smajor_weights(n_limbs: int, base_bit: int = 0) -> List[int]:
    """Weights of the s-major bin layout: row (s*n_limbs + i) <-> bit
    base_bit + 16*i + 4*s. Merging these rows into base-2^16 columns is
    four contiguous row-slices (see merge_smajor)."""
    return [base_bit + 16 * i + 4 * s
            for s in range(NIB) for i in range(n_limbs)]


def toeplitz_nib(constant: int, in_weights: Sequence[int],
                 out_weights: Sequence[int]) -> np.ndarray:
    """[len(out_weights), len(in_weights)] int8 matrix M with
    M[r, c] = base-16 digit (out_weights[r] - in_weights[c])/4 of
    `constant` (zero outside range). All weights 4-bit aligned. Computes
    the digit-space convolution y = constant * x; dropping out rows
    drops whole 4-bit product bins (exact multiples of their weight)."""
    assert all(w % 4 == 0 for w in in_weights)
    assert all(b % 4 == 0 for b in out_weights)
    nnib = max(1, (int(constant).bit_length() + 3) // 4)
    digs = nibbles_of(int(constant), nnib)
    m = np.zeros((len(out_weights), len(in_weights)), dtype=np.int8)
    for r, b in enumerate(out_weights):
        for c, w in enumerate(in_weights):
            d = (b - w) // 4
            if 0 <= d < nnib:
                m[r, c] = digs[d]
    return m


def carry_passes_for(max_bin: int) -> int:
    """Parallel 4-bit carry passes needed to bring bins <= max_bin under
    int8 range: b' = 15 + b//16 per pass."""
    b, n = max_bin, 0
    while b > MAX_PLANE_VAL:
        b = 15 + b // 16
        n += 1
    return n


@dataclasses.dataclass(frozen=True)
class NibField:
    """Per-field constants for the carry-free REDC."""

    spec: FieldSpec
    nprime: int                # -p^-1 mod 2^272
    r2: int                    # R^2 mod p
    r_mod_p: int
    p_limbs: np.ndarray        # [L]
    u_row: np.ndarray          # [BINS] f32: m-bin weights in carry-out
    p_hi_mat: np.ndarray       # [BINS, BINS] int8 (s-major rows):
    #                            m bins (bin-major) -> (m*p) >> 272 bins

    @property
    def modulus(self) -> int:
        return self.spec.modulus

    def to_mont_int(self, v: int) -> int:
        return (v << R_BITS) % self.modulus

    # ---- host conversions ([L, B] uint32 canonical limbs) ----

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
        """[BINS, nibs*L] int8: nibble planes of T_lo columns (each
        < 2^col_bits) -> bin-major bins of m === T*N' (mod R)."""
        nibs = -(-col_bits // 4)
        return toeplitz_nib(self.nprime, plane_weights(L, nibs),
                            bin_weights(BINS))

    def w_row(self, col_bits: int) -> np.ndarray:
        """[L] f32 weights for T_lo columns in the carry-out sum
        (2^(16i-272); entries below 2^-40 clamped to zero — with cols
        < 2^col_bits <= 2^23 the dropped mass is < 17*2^-17)."""
        assert col_bits <= 23, "T cols must stay f32-exact for carry-out"
        w = np.zeros((L,), dtype=np.float32)
        for i in range(L):
            e = 16 * i - R_BITS
            if e >= -40:
                w[i] = np.float32(2.0 ** e)
        return w


@lru_cache(maxsize=None)
def nib_field(spec: FieldSpec) -> NibField:
    p = spec.modulus
    assert p.bit_length() <= 255
    r = 1 << R_BITS
    nprime = (-pow(p, -1, r)) % r
    u = np.zeros((BINS,), dtype=np.float32)
    for q in range(BINS):
        num = (p << (4 * q)) % (1 << R_BITS)
        val = num / float(1 << R_BITS)
        u[q] = np.float32(val) if val >= 2.0 ** -40 else np.float32(0.0)
    p_hi = toeplitz_nib(p, bin_weights(BINS), smajor_weights(L, R_BITS))
    return NibField(
        spec=spec, nprime=nprime, r2=(r * r) % p, r_mod_p=r % p,
        p_limbs=_int_to_limbs(p), u_row=u, p_hi_mat=p_hi)


# ---------------------------------------------------------------------------
# in-kernel helpers (pure jnp on [rows, B] arrays; Mosaic-safe ops only)
# ---------------------------------------------------------------------------


def cols_to_planes(cols, col_bits: int):
    """[C, B] uint32 (each < 2^col_bits) -> [nibs*C, B] int8 nibble
    planes, row r = k*C + i (weight 16i + 4k; see plane_weights)."""
    nibs = -(-col_bits // 4)
    parts = []
    for k in range(nibs):
        parts.append(((cols >> (4 * k)) & 0xF)
                     .astype(jnp.int32).astype(jnp.int8))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def int8_matmul(mat, planes):
    """[R, K] int8 @ [K, B] int8 -> [R, B] int32 (exact)."""
    return jax.lax.dot_general(
        mat, planes,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def shift_rows_down(x, d: int = 1):
    """[R, B] -> [R, B]: row i <- row i-d (zero-fill the top d rows).
    Multiplies the represented value by its radix^d."""
    rows = x.shape[0]
    zero = jnp.zeros((d,) + x.shape[1:], dtype=x.dtype)
    return jnp.concatenate([zero, x[:rows - d]], axis=0)


def bins_carry_pass(bins, n: int = 1):
    """n parallel carry passes on 4-bit-granular bin-major bins [R, B]
    uint32; preserves sum(bins[r]*16^r) when the top bin's carry-out is
    zero (guaranteed by callers' value bounds). b' <= 15 + b/16."""
    for _ in range(n):
        bins = (bins & 0xF) + shift_rows_down(bins >> 4)
    return bins


def limbs_carry_pass(cols, n: int = 1):
    """Parallel base-2^16 carry passes on [C, B] uint32 columns."""
    for _ in range(n):
        cols = (cols & LIMB_MASK) + shift_rows_down(cols >> LIMB_BITS)
    return cols


def normalize(cols):
    """[L, B] uint32 columns (per-col < 2^32, value < 2^272) -> exact
    16-bit limbs [L, B]. Two parallel passes bring every column to
    <= 2^16 (a pending 1-bit carry at most); Kogge-Stone carry-lookahead
    resolves the worst-case ripple in ceil(log2 L) dense steps."""
    v = limbs_carry_pass(cols, 2)              # v <= 2^16
    lo = v & LIMB_MASK
    g = v >> LIMB_BITS                         # carry out of limb i {0,1}
    pr = (lo == LIMB_MASK).astype(jnp.uint32)  # propagate
    d = 1
    while d < L:
        g = g | (pr & shift_rows_down(g, d))
        pr = pr & shift_rows_down(pr, d)
        d *= 2
    return (lo + shift_rows_down(g)) & LIMB_MASK


def _place_rows(part, offset: int, total: int, width, dtype):
    """Embed `part` ([r, B]) at row `offset` of a [total, B] zero array
    without empty-array concats."""
    segs = []
    if offset > 0:
        segs.append(jnp.zeros((offset, width), dtype=dtype))
    segs.append(part)
    tail = total - offset - part.shape[0]
    if tail > 0:
        segs.append(jnp.zeros((tail, width), dtype=dtype))
    return jnp.concatenate(segs, axis=0) if len(segs) > 1 else segs[0]


def square_cols(a):
    """[L, B] exact 16-bit limbs -> [2L, B] base-2^16 column sums of a^2
    (each < 2^23). Symmetry-halved: off-diagonal products once, doubled."""
    rows = 2 * L
    b_ = a.shape[1]
    acc = None
    for i in range(L):
        prod = a[i:i + 1] * a[i:]              # [L-i, B]
        lo = prod & LIMB_MASK
        hi = prod >> LIMB_BITS
        if lo.shape[0] > 1:
            lo = jnp.concatenate([lo[:1], lo[1:] << 1], axis=0)
            hi = jnp.concatenate([hi[:1], hi[1:] << 1], axis=0)
        contrib = _place_rows(lo, 2 * i, rows, b_, a.dtype) + \
            _place_rows(hi, 2 * i + 1, rows, b_, a.dtype)
        acc = contrib if acc is None else acc + contrib
    return acc


def product_cols(a, b):
    """[L, B] x [L, B] exact 16-bit limbs -> [2L, B] column sums of a*b
    (each < 2^22)."""
    rows = 2 * L
    b_ = a.shape[1]
    acc = None
    for i in range(L):
        prod = a[i:i + 1] * b                  # [L, B]
        lo = prod & LIMB_MASK
        hi = prod >> LIMB_BITS
        contrib = _place_rows(lo, i, rows, b_, a.dtype) + \
            _place_rows(hi, i + 1, rows, b_, a.dtype)
        acc = contrib if acc is None else acc + contrib
    return acc


def merge_smajor(rows_u32, n_limbs: int = L):
    """[NIB*n_limbs, B] uint32 rows in s-major layout (row s*n+i has
    weight 16i+4s) -> [n_limbs, B] base-2^16 columns. Contiguous
    slices only. Caller guarantees sums < 2^32 (bins < 2^28/4096)."""
    out = rows_u32[:n_limbs]
    for s in range(1, NIB):
        out = out + (rows_u32[s * n_limbs:(s + 1) * n_limbs] << (4 * s))
    return out


def merge_smajor_split(rows_u32, n_limbs: int = L):
    """merge_smajor for ACCUMULATED bins (values up to ~2^21, whose
    plain 2^12-shifted merge would overflow uint32): per s-group the
    bits that would exceed the 16-bit column spill into the next column.
    Caller guarantees the top column's spill is zero (value bound).
    Output columns < 2^19 + 2^19."""
    cols = None
    spills = None
    for s in range(NIB):
        b = rows_u32[s * n_limbs:(s + 1) * n_limbs]
        keep_bits = 16 - 4 * s
        lo = (b & ((1 << keep_bits) - 1)) << (4 * s)
        sp = b >> keep_bits
        cols = lo if cols is None else cols + lo
        spills = sp if spills is None else spills + sp
    return cols + shift_rows_down(spills)


def bins_carry_pass_ext(bins, n: int):
    """bins_carry_pass that PRESERVES the exact value by first extending
    the array with n zero rows to absorb top carries (for T_lo bins,
    whose exact value feeds the carry-out row). Returns [R+n, B]."""
    pad = jnp.zeros((n,) + bins.shape[1:], dtype=bins.dtype)
    return bins_carry_pass(jnp.concatenate([bins, pad], axis=0), n)


def carry_out_f32(t_lo_weighted_f32, m_bins, u_row_col):
    """c = (T_lo + (m*p)_lo) / R, exact by rounding.

    t_lo_weighted_f32: [*, B] f32 — T_lo contributions already scaled by
    their 2^(w-272) weights (clamped). m_bins: [BINS, B] uint32
    (post-pass, <= 127, bin-major). u_row_col: [BINS, 1] f32.
    Returns [1, B] uint32."""
    mterm = m_bins.astype(jnp.int32).astype(jnp.float32) * u_row_col
    s = jnp.sum(t_lo_weighted_f32, axis=0, keepdims=True) + \
        jnp.sum(mterm, axis=0, keepdims=True)
    return (s + 0.5).astype(jnp.int32).astype(jnp.uint32)


def redc_cols(mats, t_cols, col_bits: int):
    """Carry-free REDC of T given as base-2^16 columns.

    t_cols: [C, B] uint32, C <= 2L, columns < 2^col_bits (col_bits <=
    23 keeps the f32 carry-out exact). Returns [L, B] uint32 columns of
    a value === T*R^-1 (mod p), in [0, ~9p), columns < 2^30.

    mats = (m_mat [BINS, nibs*L] int8, p_hi [BINS, BINS] int8 s-major,
            w_row [L, 1] f32, u_row [BINS, 1] f32, n_passes int) — from
    redc_mats_host(); kernels pass refs' loaded values."""
    m_mat, p_hi, w_row, u_row, n_passes = mats
    t_lo = t_cols[:L]
    planes = cols_to_planes(t_lo, col_bits)
    m_bins = int8_matmul(m_mat, planes).astype(jnp.uint32)
    m_bins = bins_carry_pass(m_bins, n_passes)
    mp_hi = int8_matmul(
        p_hi, m_bins.astype(jnp.int32).astype(jnp.int8)).astype(jnp.uint32)
    out = merge_smajor(mp_hi)                       # [L, B] < 2^29.2
    tl_f = t_lo.astype(jnp.int32).astype(jnp.float32) * w_row
    c = carry_out_f32(tl_f, m_bins, u_row)
    if t_cols.shape[0] > L:
        t_hi = t_cols[L:]
        if t_hi.shape[0] < L:
            t_hi = _place_rows(t_hi, 0, L, t_hi.shape[1], t_hi.dtype)
        out = out + t_hi[:L]
    return jnp.concatenate([out[:1] + c, out[1:]], axis=0)


def redc_mats_host(nf: NibField, col_bits: int):
    """Host-side (numpy) REDC constant pack for redc_cols."""
    nibs = -(-col_bits // 4)
    n_passes = carry_passes_for(nibs * L * 225)
    return (nf.m_matrix(col_bits), nf.p_hi_mat,
            nf.w_row(col_bits).reshape(L, 1),
            nf.u_row.reshape(BINS, 1), n_passes)


# ---------------------------------------------------------------------------
# host-side canonicalization constants + in-kernel canonical reduction
# ---------------------------------------------------------------------------


def sub_const_ks(limbs, const_limbs: np.ndarray):
    """limbs [L, B] exact 16-bit - constant (as python-int limbs), via
    Kogge-Stone borrow lookahead; returns (diff mod 2^272 [L, B],
    underflow mask [1, B] uint32 1 = constant was bigger)."""
    comp = [(LIMB_MASK - int(c)) for c in const_limbs]
    comp_arr = [limbs[i:i + 1] + comp[i] for i in range(L)]
    v = jnp.concatenate(comp_arr, axis=0)          # a + (2^272-1 - c)
    v = jnp.concatenate([v[:1] + 1, v[1:]], axis=0)  # +1 => a - c + 2^272
    # v columns <= 2*0xFFFF + 1: one parallel pass + KS for the ripple
    lo = v & LIMB_MASK
    g = v >> LIMB_BITS
    pr = (lo == LIMB_MASK).astype(jnp.uint32)
    d = 1
    while d < L:
        g = g | (pr & shift_rows_down(g, d))
        pr = pr & shift_rows_down(pr, d)
        d *= 2
    diff = (lo + shift_rows_down(g)) & LIMB_MASK
    carry_out = g[L - 1:L]                 # 1 iff a >= c (no underflow)
    return diff, 1 - carry_out


def cond_sub_const(limbs, const_limbs: np.ndarray):
    """limbs - const if limbs >= const else limbs (exact 16-bit in/out)."""
    diff, under = sub_const_ks(limbs, const_limbs)
    keep = (under != 0)
    return jnp.where(keep, limbs, diff)


def canonicalize(nf: NibField, limbs, max_multiple: int = 9):
    """Exact 16-bit limbs of a value < max_multiple*p -> canonical
    [0, p). Binary descent over precomputed k*p tables."""
    k = 1
    while k * 2 < max_multiple:
        k *= 2
    consts = []
    while k >= 1:
        consts.append(_int_to_limbs(k * nf.modulus))
        k //= 2
    # e.g. max 9p: subtract 8p, 4p, 2p, p, p
    consts.append(_int_to_limbs(nf.modulus))
    for c in consts:
        limbs = cond_sub_const(limbs, c)
    return limbs
