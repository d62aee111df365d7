"""Micro-bench: mont_mul formulations on the current device.

Compares the unrolled list-based core against a stacked .at-slice
formulation and the roll-based product-column variant, at several batch
sizes. Informs the Poseidon/MSM kernel design.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from lurk_tpu.fields import PALLAS_SCALAR
from lurk_tpu.ops import limbs as L

f = L.limb_field(PALLAS_SCALAR)
MASK = L.LIMB_MASK
NL = L.N_LIMBS


def mont_mul_stacked(a, b):
    """Original formulation: stacked arrays + .at slice adds."""
    out_shape = jnp.broadcast_shapes(a.shape, b.shape)
    cols = jnp.zeros(out_shape[:-2] + (2 * NL + 1, out_shape[-1]),
                     dtype=jnp.uint32)
    for i in range(NL):
        prod = a[..., i:i + 1, :] * b
        lo = prod & MASK
        hi = prod >> L.LIMB_BITS
        cols = cols.at[..., i:i + NL, :].add(lo)
        cols = cols.at[..., i + 1:i + 1 + NL, :].add(hi)
    p_arr = jnp.asarray(f.p_limbs, dtype=jnp.uint32).reshape((NL, 1))
    for i in range(NL):
        m = (cols[..., i, :] * f.n0inv) & MASK
        mp = m[..., None, :] * p_arr
        lo = mp & MASK
        hi = mp >> L.LIMB_BITS
        cols = cols.at[..., i:i + NL, :].add(lo)
        cols = cols.at[..., i + 1:i + 1 + NL, :].add(hi)
        carry = cols[..., i, :] >> L.LIMB_BITS
        cols = cols.at[..., i + 1, :].add(carry)
    limbs = []
    carry = jnp.zeros_like(cols[..., 0, :])
    for k in range(NL):
        v = cols[..., NL + k, :] + carry
        limbs.append(v & MASK)
        carry = v >> L.LIMB_BITS
    r = jnp.stack(limbs, axis=-2)
    # cond sub p
    p = p_arr
    borrow = jnp.zeros_like(r[..., 0, :])
    diffs = []
    for i in range(NL):
        t = r[..., i, :] + (1 << L.LIMB_BITS) - p[i] - borrow
        diffs.append(t & MASK)
        borrow = 1 - (t >> L.LIMB_BITS)
    diff = jnp.stack(diffs, axis=-2)
    return jnp.where((borrow == 0)[..., None, :], diff, r)


def mont_mul_roll(a, b):
    """Roll-based product columns + stacked reduction."""
    prod = a[..., :, None, :] * b[..., None, :, :]   # [..., 16, 16, B]
    lo = prod & MASK
    hi = prod >> L.LIMB_BITS
    padw = 2 * NL + 1
    pad_cfg = [(0, 0)] * lo.ndim
    pad_cfg[-2] = (0, padw - NL)
    lo_p = jnp.pad(lo, pad_cfg)
    hi_p = jnp.pad(hi, pad_cfg)
    cols = None
    for i in range(NL):
        c = (jnp.roll(lo_p[..., i, :, :], i, axis=-2)
             + jnp.roll(hi_p[..., i, :, :], i + 1, axis=-2))
        cols = c if cols is None else cols + c
    p_arr = jnp.asarray(f.p_limbs, dtype=jnp.uint32).reshape((NL, 1))
    for i in range(NL):
        m = (cols[..., i, :] * f.n0inv) & MASK
        mp = m[..., None, :] * p_arr
        lo = mp & MASK
        hi = mp >> L.LIMB_BITS
        cols = cols.at[..., i:i + NL, :].add(lo)
        cols = cols.at[..., i + 1:i + 1 + NL, :].add(hi)
        carry = cols[..., i, :] >> L.LIMB_BITS
        cols = cols.at[..., i + 1, :].add(carry)
    limbs = []
    carry = jnp.zeros_like(cols[..., 0, :])
    for k in range(NL):
        v = cols[..., NL + k, :] + carry
        limbs.append(v & MASK)
        carry = v >> L.LIMB_BITS
    r = jnp.stack(limbs, axis=-2)
    borrow = jnp.zeros_like(r[..., 0, :])
    diffs = []
    for i in range(NL):
        t = r[..., i, :] + (1 << L.LIMB_BITS) - p_arr[i] - borrow
        diffs.append(t & MASK)
        borrow = 1 - (t >> L.LIMB_BITS)
    diff = jnp.stack(diffs, axis=-2)
    return jnp.where((borrow == 0)[..., None, :], diff, r)


def mont_mul_list(a, b):
    return L.mont_mul(f, a, b)


def bench(name, fn, b):
    x = jnp.asarray(
        np.random.randint(0, 65536, (NL, b), dtype=np.uint32))
    jf = jax.jit(fn)
    t0 = time.time()
    jf(x, x).block_until_ready()
    t_compile = time.time() - t0
    # chain 8 muls to amortize dispatch
    def chain(x):
        y = x
        for _ in range(8):
            y = fn(y, x)
        return y
    cj = jax.jit(chain)
    cj(x).block_until_ready()
    n = 10
    t0 = time.time()
    for _ in range(n):
        cj(x).block_until_ready()
    dt = time.time() - t0
    muls_per_s = 8 * n * b / dt
    print(f"{name:10s} b={b:7d} compile={t_compile:6.1f}s "
          f"muls/s={muls_per_s:12.3e}")


if __name__ == "__main__":
    for b in (1 << 15, 1 << 18):
        bench("stacked", mont_mul_stacked, b)
        bench("roll", mont_mul_roll, b)
        bench("list", mont_mul_list, b)
