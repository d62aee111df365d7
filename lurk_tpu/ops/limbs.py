"""TPU limb arithmetic for ~255-bit prime fields.

Design (TPU-first, not a port):
  - A field element is 16 little-endian limbs of 16 bits, stored in uint32.
  - Canonical array layout is ``[..., N_LIMBS, B]``: the limb axis is
    second-to-last (maps to TPU sublanes), the batch axis is last (maps to
    the 128-wide vector lanes). All ops broadcast over leading dims.
  - Internally every op unstacks the limb axis into a Python list of
    ``[..., B]`` registers and runs FULLY UNROLLED straight-line code:
    no scatter/gather, no dynamic slicing — XLA sees a pure vector
    dataflow graph it can keep in registers and fuse end to end.
  - Multiplication is Montgomery (R = 2^256) product scanning with
    carry-safe 16-bit piece accumulation in uint32 columns: every partial
    product is split lo16/hi16 so column sums stay far below 2^32.
  - ``mont_dot`` fuses k products into ONE Montgomery reduction — the
    Poseidon MDS matvec and EC formulas lean on it.

Bit-exactness reference: lurk_tpu.fields (python ints). The reference
system performs this arithmetic in the Rust ``ff``/``pasta_curves`` crates
(/root/reference/src/field.rs); here it is re-designed for the TPU VPU.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..fields import FieldSpec

N_LIMBS = 16
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
R_BITS = N_LIMBS * LIMB_BITS  # 256

# A k-term Montgomery dot is sound iff T = sum of k products < R*p
# (REDC output < 2p needs T < R*p), i.e. k <= floor(R/p): 3 for the pasta
# fields (p ~ 2^254), 5 for BN254 (r ~ 2^253.6). mont_dot chunks to this.
# uint32 column capacity is far larger (k*32*2^16 < 2^32 => k <= ~2000).


def max_dot_terms(f: "LimbField") -> int:
    return ((1 << R_BITS) - 1) // f.modulus


def _int_to_limbs(v: int) -> np.ndarray:
    return np.array(
        [(v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(N_LIMBS)],
        dtype=np.uint32,
    )


@dataclasses.dataclass(frozen=True)
class LimbField:
    """Montgomery-form limb parameters for one prime field."""

    spec: FieldSpec
    p_limbs: np.ndarray        # [N_LIMBS]
    n0inv: int                 # -p^{-1} mod 2^16
    r2: int                    # R^2 mod p
    r_mod_p: int               # R mod p (Montgomery form of 1)

    @property
    def modulus(self) -> int:
        return self.spec.modulus

    # ---- host conversions (numpy, layout [..., N_LIMBS, B]) ----

    def from_ints(self, values: Sequence[int]) -> np.ndarray:
        """[N_LIMBS, len(values)] canonical-domain limbs."""
        out = np.zeros((N_LIMBS, len(values)), dtype=np.uint32)
        for j, v in enumerate(values):
            out[:, j] = _int_to_limbs(v % self.modulus)
        return out

    def to_ints(self, arr: np.ndarray) -> list:
        """Inverse of from_ints for a [..., N_LIMBS, B] array (flattens
        leading dims)."""
        a = np.asarray(arr).astype(object)
        a = a.reshape(-1, N_LIMBS, a.shape[-1])
        res = []
        for blk in a:
            for j in range(blk.shape[-1]):
                v = 0
                for i in range(N_LIMBS - 1, -1, -1):
                    v = (v << LIMB_BITS) | int(blk[i, j])
                res.append(v)
        return res


@lru_cache(maxsize=None)
def limb_field(spec: FieldSpec) -> LimbField:
    p = spec.modulus
    n0inv = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
    r = 1 << R_BITS
    return LimbField(
        spec=spec,
        p_limbs=_int_to_limbs(p),
        n0inv=n0inv,
        r2=(r * r) % p,
        r_mod_p=r % p,
    )


# ---------------------------------------------------------------------------
# list-based core: limbs as Python lists of [..., B] uint32 arrays
# ---------------------------------------------------------------------------

Limbs = List  # 16 arrays


def unstack(a) -> Limbs:
    return [a[..., i, :] for i in range(N_LIMBS)]


def stack(ls: Limbs):
    return jnp.stack(ls, axis=-2)


def _bc(ls: Limbs, like: Limbs) -> Limbs:
    """Broadcast limb list against another's shapes (cheap, jnp handles)."""
    return ls


def _p_list(f: LimbField) -> List[int]:
    return [int(x) for x in f.p_limbs]


def _carry_list(sums: Limbs) -> Limbs:
    """Resolve limbwise sums (< 2^32) into 16-bit limbs; drops the final
    carry (callers guarantee totals < 2^256)."""
    out = []
    carry = None
    for i in range(N_LIMBS):
        v = sums[i] if carry is None else sums[i] + carry
        out.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    return out


def _sub_list(a: Limbs, b: Limbs) -> Tuple[Limbs, object]:
    """a - b with borrow chain; returns (diff mod 2^256, borrow_out)."""
    out = []
    borrow = None
    for i in range(N_LIMBS):
        t = a[i] + (1 << LIMB_BITS) - b[i]
        if borrow is not None:
            t = t - borrow
        out.append(t & LIMB_MASK)
        borrow = 1 - (t >> LIMB_BITS)
    return out, borrow


def _sub_const_list(a: Limbs, c: List[int]) -> Tuple[Limbs, object]:
    out = []
    borrow = None
    for i in range(N_LIMBS):
        t = a[i] + ((1 << LIMB_BITS) - c[i])
        if borrow is not None:
            t = t - borrow
        out.append(t & LIMB_MASK)
        borrow = 1 - (t >> LIMB_BITS)
    return out, borrow


def _cond_sub_p_list(f: LimbField, r: Limbs) -> Limbs:
    diff, borrow = _sub_const_list(r, _p_list(f))
    keep = borrow != 0  # borrow==1 -> r < p -> keep r
    return [jnp.where(keep, r[i], diff[i]) for i in range(N_LIMBS)]


def add_list(f: LimbField, a: Limbs, b: Limbs) -> Limbs:
    s = [a[i] + b[i] for i in range(N_LIMBS)]
    return _cond_sub_p_list(f, _carry_list(s))


def add_const_list(f: LimbField, a: Limbs, c: List[int]) -> Limbs:
    s = [a[i] + c[i] for i in range(N_LIMBS)]
    return _cond_sub_p_list(f, _carry_list(s))


def sub_list(f: LimbField, a: Limbs, b: Limbs) -> Limbs:
    diff, borrow = _sub_list(a, b)
    p = _p_list(f)
    readd = _carry_list([diff[i] + p[i] for i in range(N_LIMBS)])
    take_readd = borrow != 0
    return [jnp.where(take_readd, readd[i], diff[i])
            for i in range(N_LIMBS)]


def neg_list(f: LimbField, a: Limbs) -> Limbs:
    p = _p_list(f)
    diff, _ = _sub_list([jnp.full_like(a[0], c) for c in p], a)
    is_zero = a[0]
    for i in range(1, N_LIMBS):
        is_zero = is_zero | a[i]
    zero_mask = is_zero == 0
    return [jnp.where(zero_mask, a[i], diff[i]) for i in range(N_LIMBS)]


def _accumulate_product(cols: List, a: Limbs, b: Limbs) -> None:
    """cols[k] += sum_{i+j=k} a_i*b_j split into lo/hi 16-bit pieces.
    cols has 2*N_LIMBS+1 entries (ints 0 or arrays)."""
    for i in range(N_LIMBS):
        ai = a[i]
        for j in range(N_LIMBS):
            prod = ai * b[j]          # exact in uint32 (16x16-bit)
            lo = prod & LIMB_MASK
            hi = prod >> LIMB_BITS
            k = i + j
            cols[k] = lo if cols[k] is None else cols[k] + lo
            cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi


def _mont_reduce(f: LimbField, cols: List) -> Limbs:
    """Montgomery reduction of product columns (< 2^26 each) to canonical
    limbs < p. 16 unrolled iterations."""
    p = _p_list(f)
    zeros = None
    for k in range(2 * N_LIMBS + 1):
        if cols[k] is None:
            if zeros is None:
                for c in cols:
                    if c is not None:
                        zeros = jnp.zeros_like(c)
                        break
            cols[k] = zeros
    for i in range(N_LIMBS):
        m = (cols[i] * f.n0inv) & LIMB_MASK
        for j in range(N_LIMBS):
            prod = m * p[j]
            cols[i + j] = cols[i + j] + (prod & LIMB_MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
        cols[i + 1] = cols[i + 1] + (cols[i] >> LIMB_BITS)
    out = _carry_list(cols[N_LIMBS:2 * N_LIMBS])
    return _cond_sub_p_list(f, out)


def mont_mul_list(f: LimbField, a: Limbs, b: Limbs) -> Limbs:
    cols: List = [None] * (2 * N_LIMBS + 1)
    _accumulate_product(cols, a, b)
    return _mont_reduce(f, cols)


def mont_dot_list(f: LimbField, pairs: Sequence[Tuple[Limbs, Limbs]]
                  ) -> Limbs:
    """sum_k a_k*b_k*R^{-1} mod p, chunked so each Montgomery reduction
    stays within the T < R*p soundness bound."""
    assert pairs
    kmax = max_dot_terms(f)
    acc: Limbs = None
    for start in range(0, len(pairs), kmax):
        cols: List = [None] * (2 * N_LIMBS + 1)
        for a, b in pairs[start:start + kmax]:
            _accumulate_product(cols, a, b)
        part = _mont_reduce(f, cols)
        acc = part if acc is None else add_list(f, acc, part)
    return acc


def mont_sqr_list(f: LimbField, a: Limbs) -> Limbs:
    return mont_mul_list(f, a, a)


# ---------------------------------------------------------------------------
# compact stacked-array core ([..., N_LIMBS, B] arrays end to end).
#
# ~10x smaller trace than the list core (roll-based product columns, one
# .at slice-add pair per reduction step) — used inside kernels where
# compile time matters (Pallas Poseidon, EC/MSM). Same bit-exact results.
# ---------------------------------------------------------------------------


def _carry_arr(s):
    """[..., N_LIMBS, B] sums < 2^32 -> canonical 16-bit limbs."""
    limbs = []
    carry = None
    for i in range(N_LIMBS):
        v = s[..., i, :] if carry is None else s[..., i, :] + carry
        limbs.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(limbs, axis=-2)


def _cond_sub_p_arr(f: LimbField, r):
    p = _p_list(f)
    borrow = None
    diffs = []
    for i in range(N_LIMBS):
        t = r[..., i, :] + ((1 << LIMB_BITS) - p[i])
        if borrow is not None:
            t = t - borrow
        diffs.append(t & LIMB_MASK)
        borrow = 1 - (t >> LIMB_BITS)
    diff = jnp.stack(diffs, axis=-2)
    return jnp.where((borrow != 0)[..., None, :], r, diff)


def add_arr(f: LimbField, a, b):
    return _cond_sub_p_arr(f, _carry_arr(a + b))


def sub_arr(f: LimbField, a, b):
    borrow = None
    diffs = []
    for i in range(N_LIMBS):
        t = a[..., i, :] + (1 << LIMB_BITS) - b[..., i, :]
        if borrow is not None:
            t = t - borrow
        diffs.append(t & LIMB_MASK)
        borrow = 1 - (t >> LIMB_BITS)
    diff = jnp.stack(diffs, axis=-2)
    p = _p_list(f)
    # per-limb scalar constants (Pallas kernels can't capture arrays)
    readd = _carry_arr(jnp.stack(
        [diff[..., i, :] + p[i] for i in range(N_LIMBS)], axis=-2))
    return jnp.where((borrow != 0)[..., None, :], readd, diff)


def neg_arr(f: LimbField, a):
    p = _p_list(f)
    borrow = None
    diffs = []
    for i in range(N_LIMBS):
        t = (p[i] + (1 << LIMB_BITS)) - a[..., i, :]
        if borrow is not None:
            t = t - borrow
        diffs.append(t & LIMB_MASK)
        borrow = 1 - (t >> LIMB_BITS)
    diff = jnp.stack(diffs, axis=-2)  # p - a (mod 2^256; p >= a so exact)
    # OR-fold instead of jnp.max (Mosaic lacks unsigned reductions)
    acc = a[..., 0, :]
    for i in range(1, N_LIMBS):
        acc = acc | a[..., i, :]
    is_zero = (acc == 0)[..., None, :]
    return jnp.where(is_zero, a, diff)


def _product_cols_arr(a, b, cols=None):
    """Accumulate product columns of a*b into [..., 2N+1, B] uint32."""
    prod = a[..., :, None, :] * b[..., None, :, :]   # [..., 16, 16, B]
    lo = prod & LIMB_MASK
    hi = prod >> LIMB_BITS
    padw = 2 * N_LIMBS + 1
    pad_cfg = [(0, 0)] * (lo.ndim - 2) + [(0, padw - N_LIMBS), (0, 0)]
    lo_p = jnp.pad(lo, pad_cfg)
    hi_p = jnp.pad(hi, pad_cfg)
    acc = cols
    for i in range(N_LIMBS):
        lo_i = lo_p[..., i, :, :]
        if i:  # roll with shift 0 is identity (Mosaic rejects 0-slices)
            lo_i = jnp.roll(lo_i, i, axis=-2)
        c = lo_i + jnp.roll(hi_p[..., i, :, :], i + 1, axis=-2)
        acc = c if acc is None else acc + c
    return acc


def _add_at(cols, start, vals, n):
    """cols[..., start:start+n, :] += vals via slice+concat (Mosaic has
    no scatter-add; all parts kept non-empty)."""
    parts = []
    if start > 0:
        parts.append(cols[..., :start, :])
    parts.append(cols[..., start:start + n, :] + vals)
    if start + n < cols.shape[-2]:
        parts.append(cols[..., start + n:, :])
    return jnp.concatenate(parts, axis=-2) if len(parts) > 1 else parts[0]


def _mont_reduce_arr(f: LimbField, cols):
    p = _p_list(f)
    for i in range(N_LIMBS):
        m = (cols[..., i, :] * f.n0inv) & LIMB_MASK
        mp = jnp.stack([m * p[j] for j in range(N_LIMBS)], axis=-2)
        lo = mp & LIMB_MASK
        hi = mp >> LIMB_BITS
        carry = ((cols[..., i, :] + (m * p[0] & LIMB_MASK))
                 >> LIMB_BITS)[..., None, :]
        cols = _add_at(cols, i, lo, N_LIMBS)
        cols = _add_at(cols, i + 1, hi + _pad_first(carry, N_LIMBS),
                       N_LIMBS)
    return _cond_sub_p_arr(f, _carry_arr(cols[..., N_LIMBS:2 * N_LIMBS, :]))


def _pad_first(x, n):
    """[..., 1, B] -> [..., n, B] with zeros after the first row."""
    zeros = jnp.zeros_like(x)
    return jnp.concatenate([x] + [zeros] * (n - 1), axis=-2)


def mont_mul_arr(f: LimbField, a, b):
    """Montgomery product on stacked arrays (compact trace)."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    return _mont_reduce_arr(f, _product_cols_arr(a, b))


def mont_dot_arr(f: LimbField, pairs):
    """sum a_k*b_k*R^{-1}, chunked to the T < R*p bound."""
    kmax = max_dot_terms(f)
    acc = None
    for start in range(0, len(pairs), kmax):
        cols = None
        for a, b in pairs[start:start + kmax]:
            shape = jnp.broadcast_shapes(a.shape, b.shape)
            cols = _product_cols_arr(jnp.broadcast_to(a, shape),
                                     jnp.broadcast_to(b, shape), cols)
        part = _mont_reduce_arr(f, cols)
        acc = part if acc is None else add_arr(f, acc, part)
    return acc


# ---------------------------------------------------------------------------
# array-layout wrappers ([..., N_LIMBS, B]); API-compatible with callers
# ---------------------------------------------------------------------------


def _broadcast_pair(a, b):
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    return jnp.broadcast_to(a, shape), jnp.broadcast_to(b, shape)


def add_mod(f: LimbField, a, b):
    a, b = _broadcast_pair(a, b)
    return add_arr(f, a, b)


def sub_mod(f: LimbField, a, b):
    a, b = _broadcast_pair(a, b)
    return sub_arr(f, a, b)


def neg_mod(f: LimbField, a):
    return neg_arr(f, a)


def mont_mul(f: LimbField, a, b):
    return mont_mul_arr(f, a, b)


def to_mont(f: LimbField, a):
    r2 = jnp.asarray(_int_to_limbs(f.r2), dtype=jnp.uint32).reshape(
        (N_LIMBS, 1))
    return mont_mul(f, a, jnp.broadcast_to(r2, a.shape))


def from_mont(f: LimbField, a):
    one = np.zeros((N_LIMBS, 1), dtype=np.uint32)
    one[0, 0] = 1
    return mont_mul(f, a, jnp.broadcast_to(jnp.asarray(one), a.shape))


def mont_constant(f: LimbField, value: int) -> np.ndarray:
    """Host-side: constant in Montgomery form as [N_LIMBS, 1] uint32."""
    return _int_to_limbs((value << R_BITS) % f.modulus).reshape(N_LIMBS, 1)
