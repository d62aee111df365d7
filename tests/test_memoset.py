"""MemoSet: memoized queries, provenances, transcript, LogUp balance
(parity: reference src/coroutine/memoset tests)."""

import pytest

from lurk_tpu.coroutine.memoset import DemoQuery, Scope
from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.store.core import Store


@pytest.fixture()
def store():
    return Store(BN256_SCALAR, use_device=False)


def test_factorial_memoized(store):
    scope = Scope(store, DemoQuery)
    q = DemoQuery(store.num(5)).to_ptr(store)
    result = scope.query(q)
    assert store.fetch_num(result) == 120
    # all subqueries memoized: 6 unique queries (0..5)
    assert len(scope.queries) == 6
    # querying again reuses the memo (no new queries)
    result2 = scope.query(q)
    assert store.fetch_num(result2) == 120
    assert len(scope.queries) == 6


def test_transcript_balance(store):
    scope = Scope(store, DemoQuery)
    scope.query(DemoQuery(store.num(4)).to_ptr(store))
    scope.query(DemoQuery(store.num(6)).to_ptr(store))  # reuses 0..4
    t = scope.finalize_transcript()
    assert scope.r is not None and scope.r != 0
    assert scope.verify_balance()
    # 7 unique queries total (0..6)
    assert sum(len(v) for v in scope.unique_inserted_keys.values()) == 7


def test_balance_breaks_on_tamper(store):
    scope = Scope(store, DemoQuery)
    scope.query(DemoQuery(store.num(3)).to_ptr(store))
    scope.finalize_transcript()
    assert scope.verify_balance()
    # forge an extra use that was never recorded as a removal multiplicity
    kv = next(iter(scope.multiset))
    scope.multiset[kv] += 1
    assert not scope.verify_balance()


def test_provenance_structure(store):
    scope = Scope(store, DemoQuery)
    scope.query(DemoQuery(store.num(2)).to_ptr(store))
    provs = scope.compute_provenances()
    assert len(provs) == 3
    # each provenance opens to (query, result, deps)
    from lurk_tpu.tags import ExprTag
    for q, prov in provs.items():
        assert prov.tag == ExprTag.Prov
