"""Spartan compression (CompressedSNARK parity) over relaxed R1CS.

Mirrors the reference's compress-then-verify flow
(/root/reference/src/proof/nova.rs:331-373) on a tiny synthetic circuit
and on the full Lurk pipeline at rc=1.
"""

import os

import pytest

from lurk_tpu.fields import PALLAS_SCALAR
from lurk_tpu.parser import read_with_default_state
from lurk_tpu.proof import NovaProver
from lurk_tpu.proof import spartan
from lurk_tpu.proof.nova import (
    PublicParams, R1CSShape, RecursiveSNARK,
)
from lurk_tpu.r1cs.cs import ConstraintSystem
from lurk_tpu.store.core import Store


def _cube_plus_x_cs(x_val):
    """y = x^3 + x + 5 (the classic toy circuit), public [x, y]."""
    cs = ConstraintSystem(PALLAS_SCALAR)
    p = cs.p
    x = cs.alloc_input(x_val)
    y_val = (x_val ** 3 + x_val + 5) % p
    y = cs.alloc_input(y_val)
    x2 = cs.alloc(x_val * x_val % p)
    x3 = cs.alloc(x_val ** 3 % p)
    cs.enforce({x: 1}, {x: 1}, {x2: 1})
    cs.enforce({x2: 1}, {x: 1}, {x3: 1})
    cs.enforce({x3: 1, x: 1, ConstraintSystem.ONE_VAR: 5},
               {ConstraintSystem.ONE_VAR: 1}, {y: 1})
    return cs


@pytest.fixture(scope="module")
def toy_pp():
    cs = _cube_plus_x_cs(3)
    return PublicParams.setup(R1CSShape(cs))


def _toy_proof(pp, xs):
    rs = RecursiveSNARK(pp)
    for xv in xs:
        cs = _cube_plus_x_cs(xv)
        rs.prove_step(cs.inputs[1:], list(cs.aux), check=True)
    rs.z0 = [0] * (pp.shape.num_inputs - 1)
    rs.zi = [0] * (pp.shape.num_inputs - 1)
    return rs.finish()


def test_spartan_toy_roundtrip(toy_pp):
    proof = _toy_proof(toy_pp, [3, 7, 11])
    comp = spartan.compress(toy_pp, proof)
    assert spartan.verify_compressed(toy_pp, comp)


def test_spartan_rejects_tampered_chain(toy_pp):
    proof = _toy_proof(toy_pp, [2, 5])
    comp = spartan.compress(toy_pp, proof)
    # tamper with a public input of a chained step
    comp.steps[1][0].x[0] = (comp.steps[1][0].x[0] + 1) % toy_pp.shape.p
    assert not spartan.verify_compressed(toy_pp, comp)


def test_spartan_rejects_tampered_eval(toy_pp):
    proof = _toy_proof(toy_pp, [4])
    comp = spartan.compress(toy_pp, proof)
    comp.spartan.w_eval = (comp.spartan.w_eval + 1) % toy_pp.shape.p
    assert not spartan.verify_compressed(toy_pp, comp)


def test_spartan_rejects_empty(toy_pp):
    proof = _toy_proof(toy_pp, [4])
    comp = spartan.compress(toy_pp, proof)
    comp.steps = []
    assert not spartan.verify_compressed(toy_pp, comp)


def test_compressed_proof_json_roundtrip(toy_pp):
    from lurk_tpu.cli.lurk_proof import (
        compressed_proof_from_json, compressed_proof_to_json,
    )
    proof = _toy_proof(toy_pp, [3, 8])
    comp = spartan.compress(toy_pp, proof)
    d = compressed_proof_to_json(comp)
    import json
    comp2 = compressed_proof_from_json(json.loads(json.dumps(d)))
    assert spartan.verify_compressed(toy_pp, comp2)


def test_compressed_lurk_proof():
    os.environ.setdefault("LURK_TPU_CACHE", "/tmp/lurk_tpu_test_cache_sp")
    store = Store(PALLAS_SCALAR, use_device=False)
    expr = read_with_default_state(store, "(+ (* 3 4) 5)")
    prover = NovaProver(rc=1)
    pp, proof, frames = prover.evaluate_and_prove(store, expr, limit=50)
    assert store.fetch_num(frames[-1].output[0]) == 17
    comp = spartan.compress(pp, proof)
    from lurk_tpu.proof.multiframe import io_chain_checker
    assert spartan.verify_compressed(
        pp, comp, io_chain_checker(comp.z0, comp.zi))
