"""Device limb arithmetic vs python-int oracle (bit-exact)."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lurk_tpu.fields import BN256_SCALAR, PALLAS_SCALAR, VESTA_SCALAR
from lurk_tpu.ops import limbs as L

FIELDS = [BN256_SCALAR, PALLAS_SCALAR, VESTA_SCALAR]
rng = random.Random(0xC0FFEE)


def rand_elts(field, n):
    return [rng.randrange(field.modulus) for _ in range(n)]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_roundtrip(field):
    f = L.limb_field(field)
    xs = rand_elts(field, 17) + [0, 1, field.modulus - 1]
    arr = f.from_ints(xs)
    assert f.to_ints(arr) == xs


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(field):
    f = L.limb_field(field)
    n = 64
    xs, ys = rand_elts(field, n), rand_elts(field, n)
    xs[:3] = [0, field.modulus - 1, field.modulus - 1]
    ys[:3] = [0, field.modulus - 1, 1]
    a, b = jnp.asarray(f.from_ints(xs)), jnp.asarray(f.from_ints(ys))
    got_add = f.to_ints(np.asarray(L.add_mod(f, a, b))[None])
    got_sub = f.to_ints(np.asarray(L.sub_mod(f, a, b))[None])
    got_neg = f.to_ints(np.asarray(L.neg_mod(f, a))[None])
    p = field.modulus
    assert got_add == [(x + y) % p for x, y in zip(xs, ys)]
    assert got_sub == [(x - y) % p for x, y in zip(xs, ys)]
    assert got_neg == [(-x) % p for x in xs]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_mont_mul(field):
    f = L.limb_field(field)
    n = 64
    xs, ys = rand_elts(field, n), rand_elts(field, n)
    xs[:4] = [0, 1, field.modulus - 1, field.modulus - 1]
    ys[:4] = [field.modulus - 1, 1, field.modulus - 1, 1]
    a, b = jnp.asarray(f.from_ints(xs)), jnp.asarray(f.from_ints(ys))
    # mont_mul computes a*b*R^{-1}; check against oracle
    rinv = pow(1 << L.R_BITS, -1, field.modulus)
    got = f.to_ints(np.asarray(L.mont_mul(f, a, b))[None])
    want = [x * y * rinv % field.modulus for x, y in zip(xs, ys)]
    assert got == want


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_mont_roundtrip_and_mul_semantics(field):
    f = L.limb_field(field)
    n = 32
    xs, ys = rand_elts(field, n), rand_elts(field, n)
    a, b = jnp.asarray(f.from_ints(xs)), jnp.asarray(f.from_ints(ys))
    am, bm = L.to_mont(f, a), L.to_mont(f, b)
    # from_mont(to_mont(x)) == x
    assert f.to_ints(np.asarray(L.from_mont(f, am))[None]) == xs
    # mont domain multiply == modular multiply
    prod = L.from_mont(f, L.mont_mul(f, am, bm))
    p = field.modulus
    assert f.to_ints(np.asarray(prod)[None]) == [
        x * y % p for x, y in zip(xs, ys)
    ]


def test_jit_and_batch_dims():
    field = PALLAS_SCALAR
    f = L.limb_field(field)
    xs = rand_elts(field, 8)
    a = jnp.asarray(f.from_ints(xs)).reshape(2, 4, L.N_LIMBS, 1)[..., 0]
    # reshape to [2, N_LIMBS, 4]: build explicitly instead
    arr = np.stack([f.from_ints(xs[:4]), f.from_ints(xs[4:])])  # [2, 16, 4]
    a = jnp.asarray(arr)
    sq = jax.jit(lambda x: L.mont_mul(f, x, x))(a)
    rinv = pow(1 << L.R_BITS, -1, field.modulus)
    got = f.to_ints(np.asarray(sq))
    assert got == [x * x * rinv % field.modulus for x in xs]
