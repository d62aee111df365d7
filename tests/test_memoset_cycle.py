"""MemosetCycleProver: memoset coroutines with O(#indices) SuperNova
cycle proofs (reference: memoset prove.rs on arecibo supernova)."""

import dataclasses

import pytest

from lurk_tpu.coroutine import prove_cycle as mpc
from lurk_tpu.coroutine.circuit import DemoCircuitQuery
from lurk_tpu.coroutine.memoset import DemoQuery, Scope
from lurk_tpu.coroutine.prove_cycle import MemosetCycleProver
from lurk_tpu.coroutine.toplevel import ToplevelCircuitQuery, scope_for
from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.store.core import Store

from test_toplevel import _sample_toplevel


def test_memoset_cycle_demo():
    store = Store(BN256_SCALAR)
    scope = Scope(store, DemoQuery, default_rc=3)
    scope.query(DemoQuery(store.num(5)).to_ptr(store))
    scope.finalize_transcript()
    prover = MemosetCycleProver(3, DemoCircuitQuery(), check_steps=True)
    pp, proof = prover.prove_from_scope(scope)
    assert proof.n == 2                  # 6 unique keys, rc=3
    assert mpc.verify(pp, proof)
    bad = dataclasses.replace(proof, zn=list(proof.zn))
    bad.zn[7] = 1
    assert not mpc.verify(pp, bad)


def test_memoset_cycle_toplevel_mutual():
    """even/odd: the chain STARTS at a non-zero circuit index and
    alternates indices (base_allowed + pc-selected secondary folds)."""
    store = Store(BN256_SCALAR)
    toplevel, _, even_sym, _ = _sample_toplevel()
    scope = scope_for(toplevel, store, default_rc=2)
    q_cls = scope.query_cls
    form = q_cls(even_sym, [store.num(4)]).to_ptr(store)
    result = scope.query(form)
    assert store.fetch_num(result) == 1
    scope.finalize_transcript()
    prover = MemosetCycleProver(2, ToplevelCircuitQuery(toplevel),
                                check_steps=True)
    pp, proof = prover.prove_from_scope(scope)
    assert pp.n_circuits == 3            # id/factorial absent but indexed
    assert mpc.verify(pp, proof)
