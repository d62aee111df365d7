"""NIVC (SuperNova-style) proving with a coprocessor.

Mirrors the reference's sha256_nivc example flow
(/root/reference/examples/sha256_nivc.rs): evaluate an expression that
invokes a coprocessor, chunk frames at pc breaks, fold per-circuit, and
verify.
"""

import os

import pytest

from lurk_tpu.coproc.sha256 import sha256_coprocessor
from lurk_tpu.fields import PALLAS_SCALAR
from lurk_tpu.lem import Lang
from lurk_tpu.parser import read_with_default_state
from lurk_tpu.proof.supernova import (
    SuperNovaProver, chunk_frames_nivc, verify,
)
from lurk_tpu.store.core import Store
from lurk_tpu.symbol import user_sym
from lurk_tpu.tags import ContTag


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    os.environ.setdefault(
        "LURK_TPU_CACHE", str(tmp_path_factory.mktemp("pp_cache")))
    return Store(PALLAS_SCALAR, use_device=False)


def test_nivc_sha256_prove_verify(store):
    lang = Lang()
    sym = user_sym("sha256_1")
    lang.add_coprocessor(sym, sha256_coprocessor(1))
    prover = SuperNovaProver(rc=2, lang=lang, check_steps=True)
    # (+ 1 (sha256_1 7)) — forces a cproc step in the middle
    expr = store.list([
        store.intern_lurk_symbol("+"),
        store.num(1),
        store.list([store.intern_symbol(sym), store.num(7)]),
    ])
    pp, proof, frames = prover.evaluate_and_prove(store, expr, limit=200)
    assert frames[-1].output[2].tag == ContTag.Terminal
    pcs = {pc for pc, _, _ in proof.steps}
    assert 1 in pcs, "no coprocessor circuit step folded"
    assert 0 in pcs
    assert len(pp.shapes) == 2
    assert verify(pp, proof)
    # tamper
    proof.final_witnesses[0].w[0] = (
        proof.final_witnesses[0].w[0] + 1) % pp.shapes[0].p
    assert not verify(pp, proof)


def test_chunking_breaks_at_pc(store):
    from lurk_tpu.lem.interpreter import Frame, Hints

    def mk(pc):
        return Frame([], [], Hints(), pc=pc)

    frames = [mk(0), mk(0), mk(0), mk(1), mk(0), mk(0), mk(0), mk(0)]
    chunks = chunk_frames_nivc(frames, 3)
    sizes = [(c[0].pc, len(c)) for c in chunks]
    assert sizes == [(0, 3), (1, 1), (0, 3), (0, 1)]
