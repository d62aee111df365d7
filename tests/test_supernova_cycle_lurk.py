"""SuperNova augmented-circuit NIVC over the REAL Lurk step + a
coprocessor circuit: evaluate, prove O(#circuits), verify."""

import dataclasses

import pytest

from lurk_tpu.coproc.sha256 import sha256_coprocessor
from lurk_tpu.fields import PALLAS_SCALAR
from lurk_tpu.lem.evaluation import Lang
from lurk_tpu.parser import read_with_default_state
from lurk_tpu.proof import supernova_cycle as snc
from lurk_tpu.proof.prover_supernova_cycle import SuperNovaCycleProver
from lurk_tpu.store.core import Store
from lurk_tpu.symbol import user_sym


@pytest.fixture(scope="module")
def proven():
    store = Store(PALLAS_SCALAR)
    lang = Lang()
    sym = user_sym("sha256_1")
    lang.add_coprocessor(sym, sha256_coprocessor(1))
    expr = store.list([store.intern_symbol(sym), store.num(7)])
    prover = SuperNovaCycleProver(rc=2, lang=lang, check_steps=True)
    pp, proof, frames = prover.evaluate_and_prove(store, expr)
    return store, pp, proof, frames


def test_sn_cycle_lurk_prove_verify(proven):
    store, pp, proof, frames = proven
    assert pp.n_circuits == 2        # lurk step + sha256
    assert proof.n >= 2              # at least one pc=0 and one pc=1 step
    assert SuperNovaCycleProver.verify(pp, proof)
    out = store.hash_ptr(frames[-1].output[0])
    assert proof.zn[0] == out.tag and proof.zn[1] == out.digest
    bad = dataclasses.replace(proof, zn=[(proof.zn[0] + 1)]
                              + proof.zn[1:])
    assert not SuperNovaCycleProver.verify(pp, bad)
