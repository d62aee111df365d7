"""Unit tests for the carry-free nibble-plane limb core (ops.nibbles).

Oracle: python big ints. Adversarial cases target the carry machinery:
0xFFFF propagation chains (Kogge-Stone path) and exact-2^16 ties that
defeat any fixed number of parallel carry passes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lurk_tpu.fields import PALLAS_SCALAR, VESTA_SCALAR
from lurk_tpu.ops import nibbles as NB

F = PALLAS_SCALAR
P = F.modulus
R = 1 << NB.R_BITS


def cols_value(cols):
    a = np.asarray(cols).astype(object)
    vals = []
    for j in range(a.shape[-1]):
        vals.append(sum(int(a[i, j]) << (16 * i) for i in range(a.shape[0])))
    return vals


def random_cols(rng, n_rows, bound_bits, batch):
    return rng.integers(0, 1 << bound_bits, size=(n_rows, batch),
                        dtype=np.uint32)


def test_toeplitz_matmul_is_exact_product():
    nf = NB.nib_field(F)
    rng = np.random.default_rng(0)
    const = nf.nprime
    cols = random_cols(rng, NB.L, 22, 8)
    mat = nf.m_matrix(22)
    planes = jax.jit(lambda c: NB.cols_to_planes(c, 22))(jnp.asarray(cols))
    bins = jax.jit(NB.int8_matmul)(jnp.asarray(mat), planes)
    got = [sum(int(b) << (4 * r) for r, b in
               enumerate(np.asarray(bins).astype(object)[:, j]))
           for j in range(8)]
    for j, t in enumerate(cols_value(cols)):
        assert got[j] % R == (t * const) % R


def test_redc_cols_random():
    """Random columns (T up to ~2^551 — far past R*p): correctness mod p
    must hold for ANY T; the <9p lazy bound applies only to realistic
    T < ~R*p and is checked in test_redc_chain_stays_in_lazy_domain."""
    nf = NB.nib_field(F)
    rng = np.random.default_rng(1)
    batch = 16
    col_bits = 23
    t = random_cols(rng, 2 * NB.L, col_bits, batch)
    mats = NB.redc_mats_host(nf, col_bits)
    dev = tuple(jnp.asarray(m) if isinstance(m, np.ndarray) else m
                for m in mats)
    out = jax.jit(lambda x: NB.redc_cols(dev, x, col_bits))(jnp.asarray(t))
    out = np.asarray(out)
    assert out.shape == (NB.L, batch)
    rinv = pow(R, -1, P)
    for j, tv in enumerate(cols_value(t)):
        got = cols_value(out[:, j:j + 1])[0]
        assert got % P == (tv * rinv) % P, j


def test_redc_cols_product_bound():
    """T from an actual lazy-domain product (x, y < 9p): output value
    < 9p and columns < 2^30 — the bound the kernels rely on."""
    nf = NB.nib_field(F)
    rng = np.random.default_rng(11)
    batch = 16
    xs = [int(rng.integers(0, 1 << 63)) * P // (1 << 60) % (9 * P)
          for _ in range(batch)]
    ys = [int(rng.integers(0, 1 << 63)) * P // (1 << 60) % (9 * P)
          for _ in range(batch)]
    xa = np.zeros((NB.L, batch), dtype=np.uint32)
    ya = np.zeros((NB.L, batch), dtype=np.uint32)
    for j in range(batch):
        xa[:, j] = NB._int_to_limbs(xs[j])
        ya[:, j] = NB._int_to_limbs(ys[j])
    mats = NB.redc_mats_host(nf, 22)
    dev = tuple(jnp.asarray(m) if isinstance(m, np.ndarray) else m
                for m in mats)
    out = np.asarray(jax.jit(
        lambda a, b: NB.redc_cols(dev, NB.product_cols(a, b), 22)
    )(jnp.asarray(xa), jnp.asarray(ya)))
    rinv = pow(R, -1, P)
    assert out.max() < 1 << 30
    for j in range(batch):
        got = cols_value(out[:, j:j + 1])[0]
        assert got % P == (xs[j] * ys[j] * rinv) % P
        assert got < 9 * P


def test_redc_cols_17col_input():
    """from_mont shape: T given as 17 columns only (T_hi = 0)."""
    nf = NB.nib_field(F)
    rng = np.random.default_rng(2)
    t = random_cols(rng, NB.L, 20, 8)
    mats = NB.redc_mats_host(nf, 20)
    dev = tuple(jnp.asarray(m) if isinstance(m, np.ndarray) else m
                for m in mats)
    out = np.asarray(
        jax.jit(lambda x: NB.redc_cols(dev, x, 20))(jnp.asarray(t)))
    rinv = pow(R, -1, P)
    for j, tv in enumerate(cols_value(t)):
        got = cols_value(out[:, j:j + 1])[0]
        assert got % P == (tv * rinv) % P


def test_normalize_random_and_adversarial():
    rng = np.random.default_rng(3)
    rc = random_cols(rng, NB.L, 30, 64)
    rc[16] &= 3          # keep total value < 2^272 (normalize's domain)
    cases = [rc]
    # adversarial: 0xFFFF chains with a generating low limb; exact 2^16
    adv = np.zeros((NB.L, 4), dtype=np.uint32)
    adv[0, 0] = 0x1FFFE          # pass1 -> lo=FFFE,c=1; limb1 gets +1
    adv[:, 1] = 0xFFFF
    adv[16, 1] = 0xFFFE          # keep value < 2^272
    adv[0, 1] = 0x2FFFF          # carry ripples through all-FFFF limbs
    adv[0, 2] = 1 << 16          # exact tie
    adv[1, 2] = 0xFFFF
    adv[2, 2] = 0xFFFF
    adv[0, 3] = (1 << 30) - 1
    adv[8, 3] = 0xFFFF
    cases.append(adv)
    for cols in cases:
        vals = cols_value(cols)
        assert all(v < (1 << NB.R_BITS) for v in vals)
        out = np.asarray(jax.jit(NB.normalize)(jnp.asarray(cols)))
        assert out.max() <= 0xFFFF
        assert cols_value(out) == vals


def test_square_product_cols():
    nf = NB.nib_field(F)
    rng = np.random.default_rng(4)
    xs = [int.from_bytes(rng.bytes(34), "little") % (9 * P)
          for _ in range(8)]
    ys = [int.from_bytes(rng.bytes(34), "little") % (9 * P)
          for _ in range(8)]
    xa = np.zeros((NB.L, 8), dtype=np.uint32)
    ya = np.zeros((NB.L, 8), dtype=np.uint32)
    for j, (x, y) in enumerate(zip(xs, ys)):
        xa[:, j] = NB._int_to_limbs(x)
        ya[:, j] = NB._int_to_limbs(y)
    sq = np.asarray(jax.jit(NB.square_cols)(jnp.asarray(xa)))
    pr = np.asarray(jax.jit(NB.product_cols)(jnp.asarray(xa),
                                             jnp.asarray(ya)))
    assert sq.max() < 1 << 23 and pr.max() < 1 << 22
    for j in range(8):
        assert cols_value(sq[:, j:j + 1])[0] == xs[j] * xs[j]
        assert cols_value(pr[:, j:j + 1])[0] == xs[j] * ys[j]


def test_canonicalize():
    nf = NB.nib_field(F)
    rng = np.random.default_rng(5)
    vals = [int(rng.integers(0, 9)) * P // max(1, int(rng.integers(1, 4)))
            + int(rng.integers(0, 1 << 60)) for _ in range(16)]
    vals = [v % (9 * P) for v in vals]
    vals += [0, P - 1, P, P + 1, 2 * P, 8 * P + 5, 9 * P - 1]
    arr = np.zeros((NB.L, len(vals)), dtype=np.uint32)
    for j, v in enumerate(vals):
        arr[:, j] = NB._int_to_limbs(v)
    out = np.asarray(
        jax.jit(lambda x: NB.canonicalize(nf, x))(jnp.asarray(arr)))
    got = cols_value(out)
    assert got == [v % P for v in vals]


def test_redc_chain_stays_in_lazy_domain():
    """sbox-style chain: square -> redc -> normalize, iterated; values
    must stay < 9p and reduce correctly (fixpoint of the lazy bound)."""
    nf = NB.nib_field(F)
    rng = np.random.default_rng(6)
    batch = 8
    mats = NB.redc_mats_host(nf, 23)
    dev = tuple(jnp.asarray(m) if isinstance(m, np.ndarray) else m
                for m in mats)

    def step(x):
        return NB.redc_cols(dev, NB.square_cols(NB.normalize(x)), 23)

    f = jax.jit(step)
    vals = [int(rng.integers(0, 1 << 63)) % P for _ in range(batch)]
    x = np.zeros((NB.L, batch), dtype=np.uint32)
    for j, v in enumerate(vals):
        x[:, j] = NB._int_to_limbs(v)
    cur = jnp.asarray(x)
    rinv = pow(R, -1, P)
    expect = vals
    for _ in range(6):
        cur = f(cur)
        expect = [(v * v * rinv) % P for v in expect]
        got = cols_value(np.asarray(cur))
        for g, e in zip(got, expect):
            assert g < 9 * P and g % P == e


def test_other_field():
    nf = NB.nib_field(VESTA_SCALAR)
    rng = np.random.default_rng(7)
    t = random_cols(rng, 2 * NB.L, 22, 8)
    mats = NB.redc_mats_host(nf, 22)
    dev = tuple(jnp.asarray(m) if isinstance(m, np.ndarray) else m
                for m in mats)
    out = np.asarray(
        jax.jit(lambda x: NB.redc_cols(dev, x, 22))(jnp.asarray(t)))
    q = VESTA_SCALAR.modulus
    rinv = pow(R, -1, q)
    for j, tv in enumerate(cols_value(t)):
        assert cols_value(out[:, j:j + 1])[0] % q == (tv * rinv) % q
