"""MXU-centric limb arithmetic for ~255-bit prime fields (lazy Montgomery).

This is the second-generation TPU limb core (the first, lurk_tpu.ops.limbs,
is a pure-VPU 16x16-bit design). The redesign moves ~90% of the multiply
work onto the MXU (the 128x128 systolic array) by exploiting that in the
Poseidon/EC hot loops almost every multiplication is VARIABLE x CONSTANT:

  - Montgomery reduction: m = T * (-p^-1) mod R and m * p — both are
    products by per-field constants, i.e. multiplication by a constant
    Toeplitz matrix over the limb/digit planes;
  - Poseidon MDS matvecs: multiplication by a constant t x t matrix of
    field constants — one fused constant matmul over (element, digit).

Only the variable x variable products (the Poseidon S-box chain x -> x^5)
stay on the VPU as 16x16-bit column accumulation.

Exactness scheme for the MXU: field elements are split into 8-bit digit
"planes" and fed to bf16 matmuls with float32 accumulation. Every entry
is <= 255, so each product is exact in bf16 (<= 16 bits) and column sums
stay below 2^24 (f32-exact integers) as long as a matmul accumulates at
most 257 digit terms — enforced by construction (and by element-chunking
for wide MDS arities).

Lazy reduction: R = 2^272 (17 limbs of 16 bits; 34 digit planes) with
p ~ 2^254 leaves an 18-bit slack, so REDC accepts T < R*p for dozens of
accumulated products and RETURNS values < 2p WITHOUT any conditional
subtraction. All values flow through the permutation in [0, 3p); a single
canonicalizing subtract happens only when leaving the Montgomery domain.

Plane ordering convention ("planes order"): a vector of 2K digit planes
for K 16-bit limbs is [lo_0..lo_{K-1} | hi_0..hi_{K-1}] — splitting is a
mask/shift + concat and merging is a slice + shift-add, with NO
interleaving reshapes (Mosaic-safe). Constant matrices are built with
their rows/columns permuted into this order.

Reference for the functional surface: the Rust ff/pasta_curves crates
(/root/reference/src/field.rs); the design here is TPU-first, not a port.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FieldSpec

L = 17                    # 16-bit limbs
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
R_BITS = L * LIMB_BITS    # 272
D = 2 * L                 # 8-bit digit planes per element

# f32 accumulation is exact below 2^24; digit products are <= 255*255,
# so a single matmul may contract at most this many digit terms.
MAX_MATMUL_TERMS = (1 << 24) // (255 * 255)   # 257


def _int_to_limbs17(v: int) -> np.ndarray:
    return np.array(
        [(v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(L)],
        dtype=np.uint32)


def _plane_weight(k: int, nlimbs: int) -> int:
    """8-bit weight index of plane k in planes order over nlimbs limbs."""
    return 2 * k if k < nlimbs else 2 * (k - nlimbs) + 1


def _toeplitz_planes(constant: int, out_limbs: int, in_limbs: int,
                     mod_planes: int | None = None) -> np.ndarray:
    """[2*out_limbs, 2*in_limbs] matrix M with M[r, c] = digit_{w(r)-w(c)}
    of `constant` (8-bit digits), rows/cols in planes order. Computes the
    digit-space convolution y = constant * x (optionally truncated to
    planes with weight < mod_planes, i.e. a product mod 2^(8*mod_planes)).
    """
    digits = [(constant >> (8 * i)) & 0xFF for i in range(64)]
    rows, cols = 2 * out_limbs, 2 * in_limbs
    m = np.zeros((rows, cols), dtype=np.float32)
    for r in range(rows):
        wr = _plane_weight(r, out_limbs)
        if mod_planes is not None and wr >= mod_planes:
            continue
        for c in range(cols):
            wc = _plane_weight(c, in_limbs)
            d = wr - wc
            if 0 <= d < len(digits):
                m[r, c] = digits[d]
    return m


@dataclasses.dataclass(frozen=True)
class LazyField:
    """R = 2^272 Montgomery parameters + MXU constant matrices."""

    spec: FieldSpec
    p_limbs: np.ndarray        # [L] uint32 (p in 17x16-bit limbs)
    r_mod_p: int               # R mod p (Montgomery form of 1)
    r2: int                    # R^2 mod p
    nprime_mat: np.ndarray     # [D, D] bf16-safe f32: x -> x*N' mod 2^272
    p_mat: np.ndarray          # [2*(2L), D]: m -> m*p (full 34-limb out)
    r2_mat: np.ndarray         # [2*(2L), D]: x -> x*(R^2 mod p)

    @property
    def modulus(self) -> int:
        return self.spec.modulus

    def to_mont_int(self, v: int) -> int:
        return (v << R_BITS) % self.modulus

    # ---- host conversions: [..., L, B] uint32, canonical domain ----

    def from_ints(self, values: Sequence[int]) -> np.ndarray:
        out = np.zeros((L, len(values)), dtype=np.uint32)
        for j, v in enumerate(values):
            out[:, j] = _int_to_limbs17(v % self.modulus)
        return out

    def to_ints(self, arr: np.ndarray) -> list:
        a = np.asarray(arr).astype(object)
        a = a.reshape(-1, L, a.shape[-1])
        res = []
        for blk in a:
            for j in range(blk.shape[-1]):
                v = 0
                for i in range(L - 1, -1, -1):
                    v = (v << LIMB_BITS) | int(blk[i, j])
                res.append(v)
        return res


@lru_cache(maxsize=None)
def lazy_field(spec: FieldSpec) -> LazyField:
    p = spec.modulus
    assert p.bit_length() <= 255, "lazy core assumes p < 2^255"
    r = 1 << R_BITS
    nprime = (-pow(p, -1, r)) % r
    r2 = (r * r) % p
    return LazyField(
        spec=spec,
        p_limbs=_int_to_limbs17(p),
        r_mod_p=r % p,
        r2=r2,
        nprime_mat=_toeplitz_planes(nprime, L, L, mod_planes=D),
        p_mat=_toeplitz_planes(p, 2 * L, L),
        r2_mat=_toeplitz_planes(r2, 2 * L, L),
    )


# ---------------------------------------------------------------------------
# Limb-list helpers. A field element batch is a list of L arrays [..., B]
# (uint32). "cols" are unnormalized base-2^16 column sums (uint32).
# ---------------------------------------------------------------------------


def unstack(a) -> List:
    """[K, ...] -> list of K arrays (leading feature axis)."""
    return [a[i] for i in range(a.shape[0])]


def stack(ls: List):
    return jnp.stack(ls, axis=0)


def carry(cols: List, nout: int, keep_overflow: bool = False) -> List:
    """Resolve base-2^16 column sums into exact 16-bit limbs.

    Returns nout limbs (+ the final carry as an extra entry when
    keep_overflow). Columns beyond len(cols) are treated as zero."""
    out = []
    c = None
    for i in range(nout):
        v = cols[i] if i < len(cols) else None
        if v is None:
            v = c if c is not None else jnp.zeros_like(cols[0])
        elif c is not None:
            v = v + c
        out.append(v & LIMB_MASK)
        c = v >> LIMB_BITS
    if keep_overflow:
        out.append(c)
    return out


def add_cols(a: List, b: List) -> List:
    n = max(len(a), len(b))
    z = None
    out = []
    for i in range(n):
        x = a[i] if i < len(a) else None
        y = b[i] if i < len(b) else None
        if x is None and y is None:
            if z is None:
                z = jnp.zeros_like(a[0])
            out.append(z)
        elif x is None:
            out.append(y)
        elif y is None:
            out.append(x)
        else:
            out.append(x + y)
    return out


def add_limbs(a: List, b: List) -> List:
    """Exact limb addition (values < 2^271 so no overflow past limb 16)."""
    return carry([a[i] + b[i] for i in range(L)], L)


def add_scalar_limbs(a: List, scalars: List[int]) -> List:
    return carry([a[i] + scalars[i] for i in range(L)], L)


def product_cols(a: List, b: List) -> List:
    """VPU path: 16x16-bit column accumulation of a*b (any limb counts).
    Column sums stay < len*2*2^16 << 2^32."""
    cols: List = [None] * (len(a) + len(b) + 1)
    for i in range(len(a)):
        ai = a[i]
        for j in range(len(b)):
            prod = ai * b[j]
            lo = prod & LIMB_MASK
            hi = prod >> LIMB_BITS
            k = i + j
            cols[k] = lo if cols[k] is None else cols[k] + lo
            cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    z = None
    for k in range(len(cols)):
        if cols[k] is None:
            if z is None:
                z = jnp.zeros_like(cols[0] if cols[0] is not None
                                   else cols[1])
            cols[k] = z
    return cols


def square_cols(a: List) -> List:
    """Squaring-specialized product_cols: x^2 column sums with
    n*(n+1)/2 multiplies instead of n^2 (off-diagonal products counted
    once and doubled). Bound check: per column the doubled hi/lo terms
    are < 2*len*2^17 << 2^32 for len <= 17."""
    n = len(a)
    cols: List = [None] * (2 * n + 1)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(n):
        ai = a[i]
        # diagonal
        prod = ai * ai
        acc(2 * i, prod & LIMB_MASK)
        acc(2 * i + 1, prod >> LIMB_BITS)
        for j in range(i + 1, n):
            prod = ai * a[j]
            acc(i + j, (prod & LIMB_MASK) << 1)
            acc(i + j + 1, (prod >> LIMB_BITS) << 1)
    z = None
    for k in range(len(cols)):
        if cols[k] is None:
            if z is None:
                z = jnp.zeros_like(cols[0] if cols[0] is not None
                                   else cols[1])
            cols[k] = z
    return cols


# ---------------------------------------------------------------------------
# planes <-> limbs (Mosaic-safe: concat / slice / shift only)
# ---------------------------------------------------------------------------


def to_planes_bf16(limbs: List):
    """L exact 16-bit limb arrays (each [...]) -> [D, ...] bf16 digit
    planes, feature axis LEADING (planes order: lo block then hi block).
    Casts route uint32 -> int32 -> bf16: Mosaic has no direct
    uint32->bf16 conversion; digits <= 255 are exact either way."""
    def to_bf16(x):
        return x.astype(jnp.int32).astype(jnp.bfloat16)
    los = [to_bf16(x & 0xFF) for x in limbs]
    his = [to_bf16(x >> 8) for x in limbs]
    return jnp.stack(los + his, axis=0)


def merge_planes(planes, nlimbs: int) -> List:
    """[2*nlimbs, ...] uint32 planes-order columns -> base-2^16 column
    sums (length nlimbs). Caller guarantees lo + 256*hi < 2^32."""
    return [planes[i] + (planes[nlimbs + i] << 8) for i in range(nlimbs)]


def merge_planes_split(planes, nlimbs: int) -> List:
    """merge_planes for ACCUMULATED planes (values up to ~2^28): the hi
    plane's top bits spill into the next column instead of overflowing
    the 8-bit shift. Returns nlimbs+1 columns, each < lo + 2^16 + 2^20:

        col[i]   += planes[i] + ((hi_i & 0xFF) << 8)
        col[i+1] += hi_i >> 8
    """
    cols = [None] * (nlimbs + 1)
    for i in range(nlimbs):
        hi = planes[nlimbs + i]
        v = planes[i] + ((hi & 0xFF) << 8)
        cols[i] = v if cols[i] is None else cols[i] + v
        spill = hi >> 8
        cols[i + 1] = spill
    return [c if c is not None else jnp.zeros_like(planes[0])
            for c in cols]


def const_matmul(mat, planes_bf16):
    """[Rows, Cols] f32 constant matrix (entries <= 255) applied to
    [Cols, ...] bf16 planes -> [Rows, ...] uint32 columns (exact).
    Contraction runs on the MXU; trailing axes are free (batch) dims, so
    no transpose is ever needed."""
    m = jnp.asarray(mat, dtype=jnp.bfloat16)
    out = jax.lax.dot_general(
        m, planes_bf16,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # f32 -> int32 -> uint32 (Mosaic lacks direct f32->uint32)
    return out.astype(jnp.int32).astype(jnp.uint32)


# ---------------------------------------------------------------------------
# REDC (the heart): T (column sums, < R*p) -> T * R^-1 mod p, in [0, 2p)
# ---------------------------------------------------------------------------


def redc(f: LazyField, t_cols: List, mats=None) -> List:
    """Montgomery reduction via two constant MXU matmuls.

    t_cols: base-2^16 column sums of T < R*p (up to 2L+1 columns).
    Returns 17 exact limbs of T*R^{-1} mod p, value in [0, 2p).
    `mats` optionally supplies (nprime_mat, p_mat) as traced arrays —
    Pallas kernels must source constants from refs, not captures."""
    nprime_mat, p_mat = mats if mats is not None else (f.nprime_mat,
                                                       f.p_mat)
    # 1. exact limbs of T (<= 34 limbs; T < R*p < 2^527 so carry fits)
    t16 = carry(t_cols, 2 * L)
    t_lo, t_hi = t16[:L], t16[L:]
    # 2. m = T_lo * N' mod 2^272  (MXU)
    m_cols = merge_planes(
        const_matmul(nprime_mat, to_planes_bf16(t_lo)), L)
    m16 = carry(m_cols, L)           # mod 2^272: overflow dropped
    # 3. m * p (full product; MXU)
    mp_cols = merge_planes(
        const_matmul(p_mat, to_planes_bf16(m16)), 2 * L)
    # 4. (T + m*p) / R: low half vanishes; keep its carry-out
    low = carry([t_lo[i] + mp_cols[i] for i in range(L)], L,
                keep_overflow=True)
    c = low[L]
    hi_cols = [t_hi[i] + mp_cols[L + i] for i in range(L)]
    hi_cols[0] = hi_cols[0] + c
    return carry(hi_cols, L)


def mont_mul(f: LazyField, a: List, b: List) -> List:
    """a*b*R^{-1}; inputs < sqrt(R*p) lazily-reduced limb lists."""
    return redc(f, product_cols(a, b))


def cond_sub_p(f: LazyField, a: List) -> List:
    """Canonicalize a value in [0, 2p) (or [0, p]) to [0, p)."""
    p = [int(x) for x in f.p_limbs]
    diff = []
    borrow = None
    for i in range(L):
        t = a[i] + ((1 << LIMB_BITS) - p[i])
        if borrow is not None:
            t = t - borrow
        diff.append(t & LIMB_MASK)
        borrow = 1 - (t >> LIMB_BITS)
    keep = borrow != 0   # borrow -> a < p -> keep a
    return [jnp.where(keep, a[i], diff[i]) for i in range(L)]


def canonical(f: LazyField, a: List) -> List:
    """[0, 3p) -> [0, p) (two conditional subtractions)."""
    return cond_sub_p(f, cond_sub_p(f, a))


def from_mont(f: LazyField, a: List, mats=None) -> List:
    """Montgomery -> canonical integer (< p, exact)."""
    return cond_sub_p(f, redc(f, list(a), mats))


def to_mont(f: LazyField, a: List) -> List:
    """Canonical -> Montgomery via the constant r2 matmul (MXU)."""
    cols = merge_planes(const_matmul(f.r2_mat, to_planes_bf16(a)), 2 * L)
    return redc(f, cols)
