"""NIVC proof compression: per-circuit Spartan over the SuperNova
accumulators (supernova.rs:163-198 CompressedSNARK parity)."""

import os

import pytest

from lurk_tpu.fields import PALLAS_SCALAR
from lurk_tpu.lem import Lang
from lurk_tpu.parser import read_with_default_state
from lurk_tpu.proof import supernova as sn
from lurk_tpu.store.core import Store


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    os.environ.setdefault(
        "LURK_TPU_CACHE", str(tmp_path_factory.mktemp("pp_cache")))
    return Store(PALLAS_SCALAR, use_device=False)


def test_nivc_compress_roundtrip(store):
    prover = sn.SuperNovaProver(rc=1, lang=Lang())
    expr = read_with_default_state(store, "(* 6 7)")
    pp, proof, frames = prover.evaluate_and_prove(store, expr, limit=50)
    assert sn.verify(pp, proof)
    comp = sn.compress(pp, proof)
    assert sn.verify_compressed(pp, comp)
    # tampered step IO must fail the chain check
    comp.steps[0][1].x[0] = (comp.steps[0][1].x[0] + 1) % pp.curve.order
    assert not sn.verify_compressed(pp, comp)


def test_nivc_compress_rejects_missing_spartan(store):
    prover = sn.SuperNovaProver(rc=1, lang=Lang())
    expr = read_with_default_state(store, "(+ 2 2)")
    pp, proof, _ = prover.evaluate_and_prove(store, expr, limit=50)
    comp = sn.compress(pp, proof)
    comp.spartans = {}
    assert not sn.verify_compressed(pp, comp)
