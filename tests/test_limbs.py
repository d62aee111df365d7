"""Device limb arithmetic vs python-int oracle (bit-exact)."""

import random
from functools import partial

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
def test_ops_bit_exact(field):
    """add/sub/neg/mont_mul/mont_dot in one jitted pass per field."""
    f = L.limb_field(field)
    n = 32
    xs, ys = rand_elts(field, n), rand_elts(field, n)
    xs[:4] = [0, 1, field.modulus - 1, field.modulus - 1]
    ys[:4] = [0, field.modulus - 1, field.modulus - 1, 1]
    a, b = jnp.asarray(f.from_ints(xs)), jnp.asarray(f.from_ints(ys))

    @jax.jit
    def all_ops(a, b):
        return (
            L.add_arr(f, a, b),
            L.sub_arr(f, a, b),
            L.neg_arr(f, a),
            L.mont_mul_arr(f, a, b),
            L.mont_dot_arr(f, [(a, b), (b, a), (a, a), (b, b)]),
        )

    got = [f.to_ints(np.asarray(r)[None]) for r in all_ops(a, b)]
    p = field.modulus
    rinv = pow(1 << L.R_BITS, -1, p)
    assert got[0] == [(x + y) % p for x, y in zip(xs, ys)]
    assert got[1] == [(x - y) % p for x, y in zip(xs, ys)]
    assert got[2] == [(-x) % p for x in xs]
    assert got[3] == [x * y * rinv % p for x, y in zip(xs, ys)]
    assert got[4] == [
        (2 * x * y + x * x + y * y) * rinv % p for x, y in zip(xs, ys)
    ]


def test_mont_roundtrip():
    field = PALLAS_SCALAR
    f = L.limb_field(field)
    xs = rand_elts(field, 16)
    a = jnp.asarray(f.from_ints(xs))

    @jax.jit
    def round_trip(a):
        return L.from_mont(f, L.to_mont(f, a))

    assert f.to_ints(np.asarray(round_trip(a))[None]) == xs


def test_jit_and_batch_dims():
    field = PALLAS_SCALAR
    f = L.limb_field(field)
    xs = rand_elts(field, 8)
    arr = np.stack([f.from_ints(xs[:4]), f.from_ints(xs[4:])])  # [2,16,4]
    a = jnp.asarray(arr)
    sq = jax.jit(lambda x: L.mont_mul(f, x, x))(a)
    rinv = pow(1 << L.R_BITS, -1, field.modulus)
    got = f.to_ints(np.asarray(sq))
    assert got == [x * x * rinv % field.modulus for x in xs]
