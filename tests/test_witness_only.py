"""Witness-only synthesis parity: the WitnessCS-equivalent fast path
must produce byte-identical witness vectors to full synthesis (the
reference's keystone `mismatch` check, proof/tests/mod.rs:247-248, and
the sequential==parallel witness test, multiframe.rs:1019)."""

import pytest

from lurk_tpu.fields import BN256_SCALAR, PALLAS_SCALAR
from lurk_tpu.lem import evaluation as ev
from lurk_tpu.lem.eval_step import eval_step
from lurk_tpu.parser import read_with_default_state
from lurk_tpu.proof.multiframe import MultiFrame
from lurk_tpu.store.core import Store


@pytest.mark.parametrize("src", [
    "(+ 1 (* 2 3))",
    "(letrec ((f (lambda (n) (if (= n 0) 1 (* n (f (- n 1)))))))"
    " (f 4))",
    '(car (cons "hello" (char->u64 #\\a)))',
])
def test_witness_only_matches_full(src):
    store = Store(BN256_SCALAR)
    expr = read_with_default_state(store, src)
    frames = ev.evaluate(None, expr, store, 1000)
    store.hydrate_z_cache()
    step = eval_step()
    mfs = MultiFrame.from_frames(frames, 5, step, store)
    for mf in mfs:
        x_full, w_full, _ = mf.instance(step, store)
        x_wo, w_wo, _ = mf.instance(step, store, witness_only=True)
        assert x_wo == x_full
        assert w_wo == w_full


def test_cycle_prover_witness_only_roundtrip():
    """The cycle IVC prover (augmented circuits) runs witness-only per
    step; its proof must still verify against the full-synthesis shape."""
    from lurk_tpu.proof.prover_cycle import CycleNovaProver
    store = Store(PALLAS_SCALAR)
    expr = read_with_default_state(store, "(+ 1 1)")
    prover = CycleNovaProver(rc=2)
    pp, proof, frames = prover.evaluate_and_prove(store, expr)
    assert CycleNovaProver.verify(pp, proof)
