"""Env-lookup memoset query (reference src/coroutine/memoset/env.rs):
eval semantics mirror env.rs test_env_lookup; the circuit side is
proven + verified through MemosetProver with full shape checks."""

import pytest

from lurk_tpu.coroutine.env import EnvCircuitQuery, EnvQuery
from lurk_tpu.coroutine.memoset import Scope
from lurk_tpu.coroutine import prove as mp
from lurk_tpu.coroutine.prove import MemosetProver
from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.store.core import Store
from lurk_tpu.symbol import Symbol


def _sym(s, name):
    return s.intern_symbol(Symbol(("lurk", "user", name), False))


@pytest.fixture(scope="module")
def env_setup():
    s = Store(BN256_SCALAR)
    a, b, c = (_sym(s, n) for n in "abc")
    one, two, three, four = (s.num(i) for i in (1, 2, 3, 4))
    empty = s.intern_empty_env()
    a_env = s.push_binding(a, one, empty)
    b_env = s.push_binding(b, two, a_env)
    c_env = s.push_binding(c, three, b_env)
    a2_env = s.push_binding(a, four, c_env)
    return s, (a, b, c), (one, two, three, four), \
        (empty, a_env, b_env, c_env, a2_env)


def test_env_lookup_eval(env_setup):
    """env.rs:239-280 test_env_lookup, same cases."""
    s, (a, b, c), (one, two, three, four), \
        (empty, a_env, b_env, c_env, a2_env) = env_setup
    t = s.intern_t()
    nil = s.intern_nil()

    def check(var, env, found):
        scope = Scope(s, EnvQuery, 1)
        expected = s.cons(found, t) if found is not None \
            else s.cons(nil, nil)
        got = scope.query(EnvQuery(var, env).to_ptr(s))
        assert got == expected

    check(a, empty, None)
    check(a, a_env, one)
    check(b, a_env, None)
    check(b, b_env, two)
    check(a, a2_env, four)
    check(c, b_env, None)
    check(c, c_env, three)
    check(c, a2_env, three)


def test_env_lookup_roundtrip(env_setup):
    s, (a, b, c), _, (_, a_env, *_rest) = env_setup
    q = EnvQuery(b, a_env)
    q2 = EnvQuery.from_ptr(s, q.to_ptr(s))
    assert q2 is not None and q2.var == b and q2.env == a_env


def test_env_lookup_prove_verify(env_setup):
    """Multi-hop lookup (c through a2_env: 2 hops) proven and verified
    through the NIVC memoset pipeline with full R1CS checks."""
    s, (a, b, c), (one, two, three, four), \
        (empty, a_env, b_env, c_env, a2_env) = env_setup
    scope = Scope(s, EnvQuery, default_rc=2)
    t = s.intern_t()
    got = scope.query(EnvQuery(c, a2_env).to_ptr(s))
    assert got == s.cons(three, t)
    got2 = scope.query(EnvQuery(b, empty).to_ptr(s))
    assert got2 == s.cons(s.intern_nil(), s.intern_nil())
    scope.finalize_transcript()
    assert scope.verify_balance()
    prover = MemosetProver(2, EnvCircuitQuery(), check_steps=True)
    pp, proof = prover.prove_from_scope(scope)
    assert mp.verify(pp, proof)
    assert proof.zi[7] == 0            # balanced accumulator
