"""Circom coprocessor: r1cs/wtns binary parsing, gadget packaging, and
in-circuit synthesis (coprocessor/circom + cli/circom.rs parity).

The test fabricates a tiny circuit in the iden3 r1cs binary format:
    y = x * x    (1 public input x, 1 public output y, 1 constraint)
wires: [1, y, x]."""

import json
import struct

import pytest

from lurk_tpu.coproc import circom as cc
from lurk_tpu.fields import VESTA_SCALAR
from lurk_tpu.lem.circuit import AllocatedPtr
from lurk_tpu.r1cs.cs import ConstraintSystem
from lurk_tpu.r1cs.gadgets import Num, alloc_bit, alloc_num
from lurk_tpu.tags import ExprTag

PRIME = VESTA_SCALAR.modulus


def _write_r1cs(path, prime, constraints, n_wires, n_pub_out, n_pub_in,
                n_prv_in):
    fs = 32

    def lc_bytes(lc):
        out = struct.pack("<I", len(lc))
        for wire, coeff in lc.items():
            out += struct.pack("<I", wire) + \
                int(coeff % prime).to_bytes(fs, "little")
        return out

    header = struct.pack("<I", fs) + prime.to_bytes(fs, "little")
    header += struct.pack("<IIII", n_wires, n_pub_out, n_pub_in, n_prv_in)
    header += struct.pack("<Q", n_wires)       # n_labels
    header += struct.pack("<I", len(constraints))
    body = b""
    for a, b, c in constraints:
        body += lc_bytes(a) + lc_bytes(b) + lc_bytes(c)
    buf = b"r1cs" + struct.pack("<II", 1, 2)
    buf += struct.pack("<IQ", 1, len(header)) + header
    buf += struct.pack("<IQ", 2, len(body)) + body
    path.write_bytes(buf)


@pytest.fixture()
def square_gadget(tmp_path, monkeypatch):
    monkeypatch.setenv("LURK_TPU_CACHE", str(tmp_path / "cache"))
    folder = tmp_path / "src"
    folder.mkdir()
    # y = x*x: A={x:1} B={x:1} C={y:1}; wires [1, y, x]
    _write_r1cs(folder / "square.r1cs", PRIME,
                [({2: 1}, {2: 1}, {1: 1})], 3, 1, 1, 0)
    x = 7
    cc.write_wtns(folder / "square.wtns", [1, x * x, x], PRIME)
    dest = cc.create_circom_gadget(folder, "tester/square")
    meta = json.loads((dest / "meta.json").read_text())
    assert meta["n_constraints"] == 1 and meta["n_pub_in"] == 1
    return cc.CircomGadget.load("tester/square")


def test_r1cs_wtns_roundtrip(square_gadget):
    g = square_gadget
    assert g.r1cs.prime == PRIME
    assert g.r1cs.n_wires == 3
    assert g.static_wtns == [1, 49, 7]
    assert g.check_witness(g.static_wtns)
    assert not g.check_witness([1, 50, 7])


class _Shim:
    def __init__(self, cs, blank=False):
        self.cs = cs
        self.ctx = type("C", (), {"blank": blank})()


def test_circom_circuit_satisfied(square_gadget):
    cs = ConstraintSystem(VESTA_SCALAR)
    synth = _Shim(cs)
    nd = alloc_bit(cs, True)
    env = AllocatedPtr(Num.constant(cs, int(ExprTag.Env)),
                       alloc_num(cs, 0))
    cont = AllocatedPtr(Num.constant(cs, 0x1000), alloc_num(cs, 0))
    arg = AllocatedPtr(Num.constant(cs, int(ExprTag.Num)),
                       alloc_num(cs, 7))
    out = cc.CircomCircuit(square_gadget).synthesize(
        synth, nd, [arg, env, cont])
    assert cs.is_satisfied()
    assert out[0].hash.value == 49
    # dummy mode stays satisfiable with garbage args
    cs2 = ConstraintSystem(VESTA_SCALAR)
    nd2 = alloc_bit(cs2, False)
    env2 = AllocatedPtr(Num.constant(cs2, int(ExprTag.Env)),
                        alloc_num(cs2, 0))
    cont2 = AllocatedPtr(Num.constant(cs2, 0x1000), alloc_num(cs2, 0))
    arg2 = AllocatedPtr(Num.constant(cs2, int(ExprTag.Num)),
                        alloc_num(cs2, 999))
    cc.CircomCircuit(square_gadget).synthesize(
        _Shim(cs2), nd2, [arg2, env2, cont2])
    assert cs2.is_satisfied()


def test_bad_reference_rejected(tmp_path):
    with pytest.raises(ValueError):
        cc.create_circom_gadget(tmp_path, "noslash")


def test_circom_coprocessor_nivc_prove(square_gadget):
    """Full SuperNova NIVC prove with the circom gadget as a coprocessor
    (the reference's examples/keccak.rs pipeline, offline): evaluate
    dispatches pc!=0 chunks to the circom circuit, prove + verify."""
    from lurk_tpu.lem.evaluation import Lang
    from lurk_tpu.proof import supernova as sn
    from lurk_tpu.proof.supernova import SuperNovaProver
    from lurk_tpu.store.core import Store
    from lurk_tpu.symbol import user_sym

    store = Store(VESTA_SCALAR)
    lang = Lang()
    sym = user_sym("circom_square")
    lang.add_coprocessor(sym, cc.circom_coprocessor(square_gadget))
    expr = store.list([store.intern_symbol(sym), store.num(7)])
    prover = SuperNovaProver(rc=2, lang=lang)
    pp, proof, frames = prover.evaluate_and_prove(store, expr)
    assert sn.verify(pp, proof)
    # the coprocessor's output (7^2) is the proven evaluation result
    assert store.fetch_num(frames[-1].output[0]) == 49
    pcs = {pc for pc, _, _ in proof.steps}
    assert len(pcs) > 1, "coprocessor circuit index never dispatched"
