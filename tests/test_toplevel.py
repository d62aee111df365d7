"""Toplevel LEM coroutines (Op::Crout) through the memoset Scope.

Mirrors the reference's lem_coroutine_eval_test
(/root/reference/src/lem/coroutine/toplevel.rs:273-350): factorial and
mutually recursive even/odd coroutines authored in LEM, evaluated as
memoset queries, with a balanced transcript."""

import os

import pytest

from lurk_tpu.coroutine.toplevel import Toplevel, make_query_cls, scope_for
from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.lem import ir
from lurk_tpu.lem.eval_step import eq_val, lit_num, mul, sub
from lurk_tpu.store.core import Store
from lurk_tpu.symbol import user_sym


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    os.environ.setdefault(
        "LURK_TPU_CACHE", str(tmp_path_factory.mktemp("pp_cache")))
    return Store(BN256_SCALAR, use_device=False)


def _sample_toplevel():
    factorial_sym = user_sym("factorial")
    even_sym = user_sym("even")
    odd_sym = user_sym("odd")

    factorial = ir.Func(
        "factorial", ("n",), 1,
        ir.block(
            lit_num("zero", 0),
            lit_num("one", 1),
            eq_val("n_is_zero", "n", "zero"),
            ir.if_(
                "n_is_zero",
                ir.block(ir.ret("one")),
                ir.block(
                    sub("m", "n", "one"),
                    (ir.CROUT, ("p",), factorial_sym, ("m",)),
                    mul("res", "n", "p"),
                    ir.ret("res"),
                ))))
    even = ir.Func(
        "even", ("n",), 1,
        ir.block(
            lit_num("zero", 0),
            lit_num("one", 1),
            eq_val("n_is_zero", "n", "zero"),
            ir.if_(
                "n_is_zero",
                ir.block(ir.ret("one")),
                ir.block(
                    sub("m", "n", "one"),
                    (ir.CROUT, ("res",), odd_sym, ("m",)),
                    ir.ret("res"),
                ))))
    odd = ir.Func(
        "odd", ("n",), 1,
        ir.block(
            lit_num("zero", 0),
            eq_val("n_is_zero", "n", "zero"),
            ir.if_(
                "n_is_zero",
                ir.block(ir.ret("zero")),
                ir.block(
                    lit_num("one", 1),
                    sub("m", "n", "one"),
                    (ir.CROUT, ("res",), even_sym, ("m",)),
                    ir.ret("res"),
                ))))
    toplevel = Toplevel([
        (factorial_sym, factorial),
        (even_sym, even),
        (odd_sym, odd),
    ])
    return toplevel, factorial_sym, even_sym, odd_sym


def test_coroutine_eval(store):
    toplevel, factorial_sym, even_sym, odd_sym = _sample_toplevel()
    scope = scope_for(toplevel, store)
    q_cls = scope.query_cls
    r1 = q_cls(factorial_sym, [store.num(5)]).eval(scope)
    assert store.fetch_num(r1) == 120
    r2 = q_cls(even_sym, [store.num(5)]).eval(scope)
    assert store.fetch_num(r2) == 0
    r3 = q_cls(odd_sym, [store.num(5)]).eval(scope)
    assert store.fetch_num(r3) == 1


def test_coroutine_scope_balance(store):
    toplevel, factorial_sym, _, _ = _sample_toplevel()
    scope = scope_for(toplevel, store)
    q_cls = scope.query_cls
    form = q_cls(factorial_sym, [store.num(5)]).to_ptr(store)
    result = scope.query(form)
    assert store.fetch_num(result) == 120
    scope.finalize_transcript()
    assert scope.verify_balance()


def test_query_ptr_roundtrip(store):
    toplevel, factorial_sym, _, _ = _sample_toplevel()
    q_cls = make_query_cls(toplevel)
    q = q_cls(factorial_sym, [store.num(7)])
    form = q.to_ptr(store)
    q2 = q_cls.from_ptr(store, form)
    assert q2 is not None
    assert q2.name == factorial_sym
    assert store.fetch_num(q2.args[0]) == 7


def test_memoization_shares_subqueries(store):
    toplevel, factorial_sym, even_sym, _ = _sample_toplevel()
    scope = scope_for(toplevel, store)
    q_cls = scope.query_cls
    scope.query(q_cls(factorial_sym, [store.num(6)]).to_ptr(store))
    n_after_first = len(scope.queries)
    # factorial(4) was already computed as a dependency; no new entries
    scope.query(q_cls(factorial_sym, [store.num(4)]).to_ptr(store))
    assert len(scope.queries) == n_after_first
