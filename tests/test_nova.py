"""End-to-end folding proofs: evaluate -> MultiFrames -> fold -> verify.

Mirrors the reference harness's check_nova path
(/root/reference/src/proof/tests/mod.rs:184-201) at small rc values.
"""

import os

import pytest

from lurk_tpu.fields import PALLAS_SCALAR
from lurk_tpu.parser import read_with_default_state
from lurk_tpu.proof import NovaProver
from lurk_tpu.store.core import Store


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    os.environ.setdefault(
        "LURK_TPU_CACHE", str(tmp_path_factory.mktemp("pp_cache")))
    return Store(PALLAS_SCALAR, use_device=False)


def test_prove_and_verify_square(store):
    expr = read_with_default_state(store, "((lambda (x) (* x x)) 7)")
    prover = NovaProver(rc=1, check_steps=True)
    pp, proof, frames = prover.evaluate_and_prove(store, expr, limit=50)
    assert store.fetch_num(frames[-1].output[0]) == 49
    assert NovaProver.verify(pp, proof)
    # z0/zi reflect the claimed IO
    assert len(proof.z0) == 6 and len(proof.zi) == 6


def test_tampered_proof_rejected(store):
    expr = read_with_default_state(store, "(+ 1 2)")
    prover = NovaProver(rc=1, check_steps=False)
    pp, proof, _ = prover.evaluate_and_prove(store, expr, limit=50)
    assert NovaProver.verify(pp, proof)
    # tamper with the final witness
    bad = proof.final_witness
    bad.w[3] = (bad.w[3] + 1) % pp.shape.p
    assert not NovaProver.verify(pp, proof)


def test_fib_rc_chunks(store):
    src = """(letrec ((fib (lambda (n)
                     (if (< n 2) n (+ (fib (- n 1)) (fib (- n 2)))))))
               (fib 2))"""
    expr = read_with_default_state(store, src)
    prover = NovaProver(rc=4)
    pp, proof, frames = prover.evaluate_and_prove(store, expr, limit=500)
    assert store.fetch_num(frames[-1].output[0]) == 1
    assert NovaProver.verify(pp, proof)
    # padding: steps cover ceil(len(frames)/rc)
    assert len(proof.steps) == (len(frames) + 3) // 4
