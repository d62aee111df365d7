"""SHA-256 R1CS gadget vs hashlib, and the sha256 coprocessor circuit."""

import hashlib

import pytest

from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.r1cs.cs import ConstraintSystem
from lurk_tpu.r1cs.gadgets import Bool
from lurk_tpu.r1cs.sha256_gadget import sha256_bits


def _const_bits_be(data: bytes):
    bits = []
    for byte in data:
        for i in range(7, -1, -1):
            bits.append(Bool(None, const_val=bool((byte >> i) & 1)))
    return bits


@pytest.mark.parametrize("msg", [b"", b"abc", b"a" * 64, b"xyz" * 40])
def test_sha256_gadget_matches_hashlib(msg):
    cs = ConstraintSystem(BN256_SCALAR, check=True)
    out_bits = sha256_bits(cs, _const_bits_be(msg))
    got = 0
    for b in out_bits:
        got = (got << 1) | int(b.value)
    want = int.from_bytes(hashlib.sha256(msg).digest(), "big")
    assert got == want
    assert cs.is_satisfied()


def test_sha256_coprocessor_circuit(tmp_path, monkeypatch):
    """IVC frame containing a Cproc op synthesizes the sha256 circuit and
    its output equals the interpreter's."""
    from lurk_tpu.coproc.sha256 import Sha256Circuit, sha256_coprocessor
    from lurk_tpu.lem import Lang, LangSetup, evaluate
    from lurk_tpu.lem.circuit import synthesize_frame
    from lurk_tpu.lem.eval_step import make_eval_step
    from lurk_tpu.store.core import Store
    from lurk_tpu.symbol import user_sym
    from lurk_tpu.tags import ContTag

    store = Store(BN256_SCALAR, use_device=False)
    lang = Lang()
    sym = user_sym("sha256_1")
    lang.add_coprocessor(sym, sha256_coprocessor(1))
    setup = LangSetup.ivc(lang)
    expr = store.list([store.intern_symbol(sym), store.num(5)])
    frames = evaluate(setup, expr, store, 100)
    assert frames[-1].output[2].tag == ContTag.Terminal
    expected = store.fetch_num(frames[-1].output[0])
    synths = {sym: Sha256Circuit(1)}
    digests = set()
    for frame in frames:
        cs = ConstraintSystem(BN256_SCALAR, check=True)
        synthesize_frame(cs, setup.lurk_step, store, frame,
                         cproc_synthesizers=synths)
        assert cs.is_satisfied()
        digests.add(cs.shape_digest())
    assert len(digests) == 1, "sha256 circuit breaks shape uniformity"
