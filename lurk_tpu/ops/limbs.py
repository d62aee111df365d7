"""TPU limb arithmetic for ~255-bit prime fields.

Design (TPU-first, not a port):
  - A field element is 16 little-endian limbs of 16 bits, stored in uint32.
  - Canonical array layout is ``[..., N_LIMBS, B]``: the limb axis is
    second-to-last (maps to TPU sublanes), the batch axis is last (maps to
    the 128-wide vector lanes). All ops broadcast over leading dims.
  - Multiplication is Montgomery (R = 2^256) via product-scanning with
    carry-safe 16-bit piece accumulation in uint32 columns: every partial
    product is split lo16/hi16 so column sums stay far below 2^32.
  - All control flow is static: fixed 16-step carry chains, no
    data-dependent branches — XLA traces one straight-line vector program.

Bit-exactness reference: lurk_tpu.fields (python ints). The reference system
performs this arithmetic in the Rust ``ff``/``pasta_curves`` crates
(/root/reference/src/field.rs); here it is re-designed for the TPU VPU.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..fields import FieldSpec

N_LIMBS = 16
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
R_BITS = N_LIMBS * LIMB_BITS  # 256


def _int_to_limbs(v: int) -> np.ndarray:
    return np.array(
        [(v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(N_LIMBS)],
        dtype=np.uint32,
    )


@dataclasses.dataclass(frozen=True)
class LimbField:
    """Montgomery-form limb parameters for one prime field."""

    spec: FieldSpec
    # numpy constants (hashable wrapper not needed; frozen dataclass by id)
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
# jnp ops. All arrays uint32 with limb axis at -2.
# ---------------------------------------------------------------------------


def _p_col(f: LimbField, i: int) -> int:
    return int(f.p_limbs[i])


def add_mod(f: LimbField, a, b):
    """(a + b) mod p, inputs canonical (< p)."""
    s = a + b  # limbwise, <= 2^17 per limb
    s = _carry_propagate(s)
    return _cond_sub_p(f, s)


def sub_mod(f: LimbField, a, b):
    """(a - b) mod p, inputs canonical."""
    diff, borrow = _sub_limbs(a, b)
    added = _carry_propagate(diff + _p_broadcast(f, a))
    return jnp.where((borrow != 0)[..., None, :], added, diff)


def neg_mod(f: LimbField, a):
    """(-a) mod p for canonical a (maps 0 -> 0)."""
    p = _p_broadcast(f, a)
    diff, _ = _sub_limbs(p, a)
    is_zero = _is_zero(a)
    return jnp.where(is_zero, a, diff)


def _p_broadcast(f: LimbField, like):
    del like  # broadcasting against [..., N_LIMBS, B] only needs [N_LIMBS, 1]
    return jnp.asarray(f.p_limbs, dtype=jnp.uint32).reshape((N_LIMBS, 1))


def _is_zero(a):
    return (jnp.max(a, axis=-2, keepdims=True) == 0)


def _carry_propagate(s):
    """Resolve limbwise sums (< 2^32) into 16-bit limbs; drops carry-out of
    the top limb (callers guarantee totals < 2^256)."""
    limbs = []
    carry = jnp.zeros_like(s[..., 0, :])
    for i in range(N_LIMBS):
        v = s[..., i, :] + carry
        limbs.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(limbs, axis=-2)


def _sub_limbs(a, b):
    """a - b with borrow chain; returns (diff mod 2^256, borrow_out)."""
    limbs = []
    borrow = jnp.zeros_like(a[..., 0, :])
    for i in range(N_LIMBS):
        t = a[..., i, :] + (1 << LIMB_BITS) - b[..., i, :] - borrow
        limbs.append(t & LIMB_MASK)
        borrow = 1 - (t >> LIMB_BITS)
    return jnp.stack(limbs, axis=-2), borrow


def _cond_sub_p(f: LimbField, r):
    p = _p_broadcast(f, r)
    diff, borrow = _sub_limbs(r, p)
    return jnp.where((borrow == 0)[..., None, :], diff, r)


def mont_mul(f: LimbField, a, b):
    """Montgomery product a * b * R^{-1} mod p.

    Inputs canonical-or-Montgomery (< p); output < p. Product scanning with
    lo/hi 16-bit piece accumulation; 16 reduction iterations, unrolled.
    """
    out_shape = jnp.broadcast_shapes(a.shape, b.shape)
    cols = jnp.zeros(out_shape[:-2] + (2 * N_LIMBS + 1, out_shape[-1]),
                     dtype=jnp.uint32)
    # ---- full product columns ----
    for i in range(N_LIMBS):
        prod = a[..., i:i + 1, :] * b  # [..., N_LIMBS, B], exact in uint32
        lo = prod & LIMB_MASK
        hi = prod >> LIMB_BITS
        cols = cols.at[..., i:i + N_LIMBS, :].add(lo)
        cols = cols.at[..., i + 1:i + 1 + N_LIMBS, :].add(hi)
    # ---- Montgomery reduction, 16 iterations ----
    p_arr = jnp.asarray(f.p_limbs, dtype=jnp.uint32).reshape((N_LIMBS, 1))
    for i in range(N_LIMBS):
        m = (cols[..., i, :] * f.n0inv) & LIMB_MASK  # [..., B]
        mp = m[..., None, :] * p_arr                 # [..., N_LIMBS, B]
        lo = mp & LIMB_MASK
        hi = mp >> LIMB_BITS
        cols = cols.at[..., i:i + N_LIMBS, :].add(lo)
        cols = cols.at[..., i + 1:i + 1 + N_LIMBS, :].add(hi)
        # col i is now ≡ 0 mod 2^16; push its carry into col i+1
        carry = cols[..., i, :] >> LIMB_BITS
        cols = cols.at[..., i + 1, :].add(carry)
    # ---- final carry propagation over cols[16..33) ----
    limbs = []
    carry = jnp.zeros_like(cols[..., 0, :])
    for k in range(N_LIMBS):
        v = cols[..., N_LIMBS + k, :] + carry
        limbs.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    # top column (index 32) + carry must vanish for T < p*R; result < 2p
    r = jnp.stack(limbs, axis=-2)
    return _cond_sub_p(f, r)


def to_mont(f: LimbField, a):
    r2 = jnp.asarray(_int_to_limbs(f.r2), dtype=jnp.uint32).reshape(
        (N_LIMBS, 1))
    return mont_mul(f, a, r2)


def from_mont(f: LimbField, a):
    one = np.zeros((N_LIMBS, 1), dtype=np.uint32)
    one[0, 0] = 1
    return mont_mul(f, a, jnp.asarray(one))


def mont_constant(f: LimbField, value: int) -> np.ndarray:
    """Host-side: constant in Montgomery form as [N_LIMBS, 1] uint32."""
    return _int_to_limbs((value << R_BITS) % f.modulus).reshape(N_LIMBS, 1)
