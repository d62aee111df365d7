"""MemosetProver: NIVC folding over CoroutineCircuit steps
(parity: reference src/coroutine/memoset/prove.rs tests)."""

import dataclasses

import pytest

from lurk_tpu.coroutine import prove as mp
from lurk_tpu.coroutine.circuit import DemoCircuitQuery
from lurk_tpu.coroutine.memoset import DemoQuery, Scope
from lurk_tpu.coroutine.prove import MemosetProver
from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.store.core import Store
from lurk_tpu.tags import ExprTag


@pytest.fixture(scope="module")
def proven():
    store = Store(BN256_SCALAR)
    scope = Scope(store, DemoQuery, default_rc=3)
    n = 5
    form = DemoQuery(store.num(n)).to_ptr(store)
    result = scope.query(form)
    assert store.fetch_num(result) == 120
    scope.finalize_transcript()
    assert scope.verify_balance()
    prover = MemosetProver(3, DemoCircuitQuery(), check_steps=True)
    pp, proof = prover.prove_from_scope(scope)
    return store, scope, pp, proof


def test_memoset_prove_verify(proven):
    store, scope, pp, proof = proven
    # 6 unique keys (factorial 5..0), rc=3 -> 2 NIVC steps
    assert len(proof.steps) == 2
    assert mp.verify(pp, proof)
    # final state: balanced accumulator, transcript binds r
    assert proof.zi[7] == 0
    assert proof.zi[9] == store.hash_ptr(scope.transcript.acc).digest
    assert proof.zi[11] == scope.r


def test_memoset_prove_tamper(proven):
    store, scope, pp, proof = proven
    bad = dataclasses.replace(proof, zi=list(proof.zi))
    bad.zi[7] = 1
    assert not mp.verify(pp, bad)
    # tampering a step's public IO breaks the fold chain check
    idx, inst, comm_t = proof.steps[0]
    bad_inst = dataclasses.replace(inst, x=[(inst.x[0] + 1)
                                            % pp.shapes[idx].p]
                                   + inst.x[1:])
    bad2 = dataclasses.replace(
        proof, steps=[(idx, bad_inst, comm_t)] + proof.steps[1:])
    assert not mp.verify(pp, bad2)


def test_circuit_shape_uniform():
    """Blank-vs-real shape uniformity: chunks with different key counts
    (incl. dummy padding) must synthesize the identical circuit shape."""
    store = Store(BN256_SCALAR)
    scope = Scope(store, DemoQuery, default_rc=4)
    scope.query(DemoQuery(store.num(6)).to_ptr(store))
    scope.finalize_transcript()
    prover = MemosetProver(4, DemoCircuitQuery(), check_steps=True)
    pp, proof = prover.prove_from_scope(scope)
    # 7 unique keys, rc=4 -> chunks of 4 and 3(+1 dummy): same shape
    assert len(pp.shapes) == 1
    assert mp.verify(pp, proof)
