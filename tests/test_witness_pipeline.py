"""Witness-gen ∥ folding pipeline: the parallel (fork pool, byte-packed
step segments) and serial paths must produce IDENTICAL proofs — the
reference pins the same property for its rayon witness generation
(src/lem/multiframe.rs:1019)."""

import pytest

import lurk_tpu.config as cfg
from lurk_tpu.fields import PALLAS_SCALAR
from lurk_tpu.lem import evaluation as ev
from lurk_tpu.parser import read_with_default_state
from lurk_tpu.proof.prover_cycle import CycleNovaProver
from lurk_tpu.store.core import Store

SRC = "(letrec ((f (lambda (n) (if (= n 0) 1 (* n (f (- n 1))))))) (f 4))"


def test_parallel_witness_pipeline_matches_serial():
    store = Store(PALLAS_SCALAR)
    expr = read_with_default_state(store, SRC)
    frames = ev.evaluate(None, expr, store, 10000)
    prover = CycleNovaProver(rc=3)
    s = cfg.settings()
    orig = s.perf.parallel_witness_gen
    try:
        s.perf.parallel_witness_gen = False
        pp, serial = prover.prove_from_frames(store, frames)
        s.perf.parallel_witness_gen = True
        pp2, parallel = prover.prove_from_frames(store, frames)
    finally:
        s.perf.parallel_witness_gen = orig
    assert CycleNovaProver.verify(pp2, parallel)
    assert serial.zn == parallel.zn
    assert serial.u1.x == parallel.u1.x
    assert serial.u1.comm_w == parallel.u1.comm_w
    assert serial.u1.comm_e == parallel.u1.comm_e
    assert serial.u2.comm_w == parallel.u2.comm_w
