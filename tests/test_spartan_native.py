"""Native Spartan kernels (native/spartan.cpp + r1cs.cpp CSR helpers)
vs the pure-python mle.py oracle — the keystone bit-exactness pattern
(reference proof/tests/mod.rs:247 witness-equality analog)."""

import random

import pytest

from lurk_tpu.fields import BN256_SCALAR, PALLAS_SCALAR
from lurk_tpu.native import spartan as ns
from lurk_tpu.proof import mle
from lurk_tpu.proof import spartan as sp
from lurk_tpu.proof.nova import R1CSShape
from lurk_tpu.r1cs.cs import ConstraintSystem

pytestmark = pytest.mark.skipif(not ns.available(),
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("field", [BN256_SCALAR, PALLAS_SCALAR],
                         ids=lambda f: f.name)
def test_native_sumchecks_match_python(field):
    p = field.modulus
    r = random.Random(2)
    k = 9
    n = 1 << k
    vecs = [[r.randrange(p) for _ in range(n)] for _ in range(5)]
    eq, az, bz, cz, e = vecs
    u = r.randrange(p)
    chals = [r.randrange(p) for _ in range(k)]

    def mkchal():
        it = iter(chals)
        return lambda ev: next(it)

    def comb1(vals):
        eqv, a, b, c, ev_ = vals
        return eqv * (a * b - u * c - ev_) % p

    want = mle.sumcheck_prove(0, k, [list(v) for v in vecs], comb1, 3,
                              p, mkchal())
    got = ns.sumcheck1(eq, az, bz, cz, e, u, p, mkchal())
    assert got == want

    mv = [r.randrange(p) for _ in range(n)]
    z = [r.randrange(p) for _ in range(n)]

    def comb2(vals):
        return vals[0] * vals[1] % p

    want2 = mle.sumcheck_prove(0, k, [list(mv), list(z)], comb2, 2, p,
                               mkchal())
    got2 = ns.sumcheck2(mv, z, p, mkchal())
    assert got2 == want2


def test_native_chi_and_mle_match_python():
    p = BN256_SCALAR.modulus
    r = random.Random(5)
    rs = [r.randrange(p) for _ in range(10)]
    assert ns.chi_table(rs, p) == mle.chi_table(rs, p)
    vec = [r.randrange(p) for _ in range(1 << 10)]
    assert ns.mle_eval(vec, rs, p) == mle.mle_eval(vec, rs, p)


def _cube(field, x_val):
    cs = ConstraintSystem(field)
    p = cs.p
    x = cs.alloc_input(x_val)
    y = cs.alloc_input((x_val ** 3 + x_val + 5) % p)
    x2 = cs.alloc(x_val * x_val % p)
    x3 = cs.alloc(x_val ** 3 % p)
    cs.enforce({x: 1}, {x: 1}, {x2: 1})
    cs.enforce({x2: 1}, {x: 1}, {x3: 1})
    cs.enforce({x3: 1, x: 1, ConstraintSystem.ONE_VAR: 5},
               {ConstraintSystem.ONE_VAR: 1}, {y: 1})
    return cs


def test_native_mvec_and_matrix_evals_match_python():
    shape = R1CSShape(_cube(BN256_SCALAR, 3))
    p = shape.p
    n_half, m_pad = sp._dims(shape)
    r = random.Random(8)
    rx = [r.randrange(p) for _ in range(m_pad.bit_length() - 1)]
    ry = [r.randrange(p) for _ in range((2 * n_half).bit_length() - 1)]
    chi_rx = mle.chi_table(rx, p)
    chi_ry = mle.chi_table(ry, p)
    rr = r.randrange(p)
    m_vec = [0] * (2 * n_half)
    r2 = rr * rr % p
    for i, (a_lc, b_lc, c_lc) in enumerate(shape.rows):
        ci = chi_rx[i]
        for lc, rp in ((a_lc, 1), (b_lc, rr), (c_lc, r2)):
            w = ci * rp % p
            for j, val in lc.items():
                idx = sp._col_index(shape, n_half, j)
                m_vec[idx] = (m_vec[idx] + w * val) % p
    assert ns.spartan_mvec(shape, chi_rx, rr, n_half) == m_vec
    assert ns.matrix_evals(shape, chi_rx, chi_ry, n_half) == \
        sp._matrix_evals(shape, chi_rx, chi_ry, n_half)


def test_cross_term_cached_matches_uncached():
    """cross_term_cached (cached accumulator matvecs) == the plain
    kernel, and the returned abc2 equals the strict instance's
    matvecs (so the forward-fold abc1' = abc1 + r*abc2 is exact)."""
    import random
    from lurk_tpu.native import r1cs as nr
    from lurk_tpu.native.r1cs import PackedVec
    from lurk_tpu.proof.nova import (
        RelaxedInstance, RelaxedWitness, cross_term, z_vector,
    )
    shape = R1CSShape(_cube(BN256_SCALAR, 3))
    p = shape.p
    r = random.Random(4)
    x1 = [r.randrange(p) for _ in range(shape.num_inputs - 1)]
    w1 = [r.randrange(p) for _ in range(shape.num_aux)]
    u1 = r.randrange(p)
    inst1 = RelaxedInstance(None, None, x1, u1)
    wit1 = RelaxedWitness(w1, [0] * shape.num_constraints)
    cs2 = _cube(BN256_SCALAR, 7)
    want = cross_term(shape, inst1, wit1, cs2.inputs[1:],
                      list(cs2.aux))
    z1 = z_vector(shape, x1, w1, u1)
    abc1 = nr.matvecs_pv(shape, z1)
    z2 = z_vector(shape, cs2.inputs[1:], list(cs2.aux), 1)
    t, abc2 = nr.cross_term_cached(shape, abc1, u1, z2)
    assert t.ints() == list(want)
    a2, b2, c2 = shape.matvecs(z2)
    assert abc2.ints() == list(a2) + list(b2) + list(c2)
    # forward fold equals recomputation at the folded z
    rr = r.randrange(p)
    folded = nr.vec_rlc_pv(p, abc1, abc2, rr)
    z1f = [(a + rr * b) % p for a, b in zip(z1, z2)]
    assert folded.ints() == nr.matvecs_pv(shape, z1f).ints()
