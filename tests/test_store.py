"""Store interning + content addressing vs reference anchors."""

import pytest

from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.store import Store, ATOM
from lurk_tpu.symbol import Symbol, lurk_sym, user_sym
from lurk_tpu.tags import ContTag, ExprTag


@pytest.fixture()
def store():
    return Store(BN256_SCALAR, use_device=False)


def test_commit_num_anchor(store):
    # reference src/lem/store.rs:1473
    comm = store.commit(store.num_u64(0))
    assert store.fetch_f(comm) == int(
        "1d501baeefe83acf0e7137180b091834f542a5059dbaf99ec82c5e19d3bb9201", 16
    )


def test_commit_closure_anchors(store):
    # reference src/lem/tests/eval_tests.rs:379,461 — evaluation results of
    # (commit (lambda (x) x)) and (commit (lambda () nil))
    x = store.intern_symbol(user_sym("x"))
    fun = store.intern_fun(store.list([x]), x, store.intern_empty_env())
    assert store.fetch_f(store.commit(fun)) == int(
        "2f31ee658b82c09daebbd2bd976c9d6669ad3bd6065056763797d5aaf4a3001b", 16
    )
    nil = store.intern_nil()
    fun2 = store.intern_fun(nil, nil, store.intern_empty_env())
    assert store.fetch_f(store.commit(fun2)) == int(
        "1b1eaa8d0e216957c90a9a1d55784f0d9a4f84918d5a898a1ca74e6260cfd1e7", 16
    )


def test_string_roundtrip(store):
    for s in ["", "a", "hello world", "λurk"]:
        ptr = store.intern_string(s)
        assert ptr.tag == ExprTag.Str
        assert store.fetch_string(ptr) == s
    # interning is idempotent (hash-consing)
    assert store.intern_string("abc") == store.intern_string("abc")


def test_symbol_roundtrip(store):
    for sym in [lurk_sym("lambda"), user_sym("x"), Symbol.key(["k"]),
                Symbol.root_sym()]:
        ptr = store.intern_symbol(sym)
        assert store.fetch_symbol(ptr) == sym
    nil_ptr = store.intern_nil()
    assert nil_ptr.tag == ExprTag.Nil
    assert store.fetch_symbol(nil_ptr) == lurk_sym("nil")
    key_ptr = store.intern_symbol(Symbol.key(["kw"]))
    assert key_ptr.tag == ExprTag.Key


def test_car_cdr(store):
    nil = store.intern_nil()
    a, d = store.car_cdr(nil)
    assert a == nil and d == nil
    one, two = store.num_u64(1), store.num_u64(2)
    pair = store.cons(one, two)
    assert store.car_cdr(pair) == (one, two)
    # string car/cdr
    s = store.intern_string("ab")
    car, cdr = store.car_cdr(s)
    assert store.fetch_char(car) == "a"
    assert store.fetch_string(cdr) == "b"
    empty = store.intern_string("")
    car, cdr = store.car_cdr(empty)
    assert car == nil and store.fetch_string(cdr) == ""


def test_lists(store):
    elts = [store.num_u64(i) for i in range(5)]
    lst = store.list(elts)
    assert store.fetch_proper_list(lst) == elts
    tail = store.num_u64(99)
    implist = store.improper_list(elts, tail)
    got, last = store.fetch_list(implist)
    assert got == elts and last == tail


def test_env_bindings(store):
    env = store.intern_empty_env()
    assert env.kind == ATOM
    x = store.intern_symbol(user_sym("x"))
    y = store.intern_symbol(user_sym("y"))
    env1 = store.push_binding(x, store.num_u64(1), env)
    env2 = store.push_binding(y, store.num_u64(2), env1)
    assert env2.tag == ExprTag.Env
    fetched = store.fetch_env(env2)
    assert fetched == [(y, store.num_u64(2)), (x, store.num_u64(1))]
    assert store.pop_binding(env2)[2] == env1


def test_cont_atoms(store):
    term = store.cont_terminal()
    assert term.tag == ContTag.Terminal
    assert store.fetch_f(term) == store.hash8zeros


def test_hydrate_matches_lazy(store):
    # build a DAG, hydrate in batch, compare against lazy per-ptr hashing
    exprs = [store.list([store.num_u64(i), store.intern_string(f"s{i}")])
             for i in range(10)]
    store.hydrate_z_cache()
    lazy = Store(BN256_SCALAR, use_device=False)
    exprs2 = [lazy.list([lazy.num_u64(i), lazy.intern_string(f"s{i}")])
              for i in range(10)]
    for a, b in zip(exprs, exprs2):
        assert store.hash_ptr(a) == lazy.hash_ptr(b)


def test_open_roundtrip(store):
    payload = store.num_u64(42)
    comm = store.hide(123, payload)
    secret, p = store.open(store.fetch_f(comm))
    assert secret == 123 and p == payload
