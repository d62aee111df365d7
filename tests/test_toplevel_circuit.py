"""Toplevel LEM coroutine CIRCUITS through the memoset NIVC prover
(reference src/lem/coroutine/{toplevel,synthesis}.rs tests)."""

import os

import pytest

from lurk_tpu.coroutine import prove as mp
from lurk_tpu.coroutine.prove import MemosetProver
from lurk_tpu.coroutine.toplevel import (
    Toplevel, ToplevelCircuitQuery, scope_for,
)
from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.store.core import Store

from test_toplevel import _sample_toplevel


@pytest.fixture()
def store(tmp_path, monkeypatch):
    monkeypatch.setenv("LURK_TPU_CACHE", str(tmp_path))
    return Store(BN256_SCALAR, use_device=False)


def test_toplevel_factorial_nivc(store):
    toplevel, factorial_sym, _, _ = _sample_toplevel()
    scope = scope_for(toplevel, store, default_rc=3)
    q_cls = scope.query_cls
    form = q_cls(factorial_sym, [store.num(5)]).to_ptr(store)
    result = scope.query(form)
    assert store.fetch_num(result) == 120
    scope.finalize_transcript()
    assert scope.verify_balance()
    prover = MemosetProver(3, ToplevelCircuitQuery(toplevel),
                           check_steps=True)
    pp, proof = prover.prove_from_scope(scope)
    assert mp.verify(pp, proof)
    assert proof.zi[7] == 0                     # balanced accumulator
    assert proof.zi[11] == scope.r              # Fiat-Shamir binding


def test_toplevel_mutual_recursion_nivc(store):
    """even/odd mutual recursion: two circuit indices, cross-index
    internal queries (the NIVC case the reference's coroutine tests
    pin, prove.rs:340)."""
    toplevel, _, even_sym, _ = _sample_toplevel()
    scope = scope_for(toplevel, store, default_rc=2)
    q_cls = scope.query_cls
    form = q_cls(even_sym, [store.num(4)]).to_ptr(store)
    result = scope.query(form)
    assert store.fetch_num(result) == 1
    scope.finalize_transcript()
    assert scope.verify_balance()
    prover = MemosetProver(2, ToplevelCircuitQuery(toplevel),
                           check_steps=True)
    pp, proof = prover.prove_from_scope(scope)
    # two circuit indices (even, odd) — per-index shapes + fold chains
    assert len(pp.shapes) == 2
    assert mp.verify(pp, proof)
