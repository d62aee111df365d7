"""Nova IVC with augmented circuits over the REAL Lurk step circuit:
evaluate a small program, prove it O(1), verify, and compress."""

import pytest

from lurk_tpu.fields import PALLAS_SCALAR
from lurk_tpu.parser import read_with_default_state
from lurk_tpu.proof import prover_cycle
from lurk_tpu.proof.prover_cycle import CycleNovaProver
from lurk_tpu.store.core import Store


@pytest.fixture(scope="module")
def proven():
    store = Store(PALLAS_SCALAR)
    expr = read_with_default_state(store, "(+ 1 (* 2 3))")
    prover = CycleNovaProver(rc=2, check_steps=True)
    pp, proof, frames = prover.evaluate_and_prove(store, expr)
    return store, pp, proof, frames


def test_cycle_lurk_prove_verify(proven):
    store, pp, proof, frames = proven
    assert proof.n >= 1
    assert CycleNovaProver.verify(pp, proof)
    # the proven output is the evaluation result: zn[0:2] = (tag, digest)
    out = store.hash_ptr(frames[-1].output[0])
    assert proof.zn[0] == out.tag and proof.zn[1] == out.digest
    # tamper
    import dataclasses
    bad = dataclasses.replace(proof, zn=[(proof.zn[0] + 1)] + proof.zn[1:])
    assert not CycleNovaProver.verify(pp, bad)


def test_cycle_lurk_compress(proven):
    store, pp, proof, frames = proven
    cp = prover_cycle.compress_cycle(pp, proof)
    assert prover_cycle.verify_compressed_cycle(pp, cp)
    import dataclasses
    bad = dataclasses.replace(cp, zn=[(cp.zn[0] + 1)] + cp.zn[1:])
    assert not prover_cycle.verify_compressed_cycle(pp, bad)
