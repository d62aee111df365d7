"""Coprocessors: trie (reference-pinned empty roots, lookup/insert),
sha256 eval parity layout, and coprocessor evaluation in IVC/NIVC modes.
"""

import pytest

from lurk_tpu.coproc.sha256 import sha256_coprocessor
from lurk_tpu.coproc.trie import Trie, install_trie_lang
from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.lem import LangSetup, Lang, evaluate
from lurk_tpu.parser import read_with_default_state
from lurk_tpu.store.core import Store
from lurk_tpu.symbol import user_sym
from lurk_tpu.tags import ContTag


@pytest.fixture()
def store():
    return Store(BN256_SCALAR, use_device=False)


def test_trie_empty_roots_pinned(store):
    """Reference anchors: trie/mod.rs:925-1010 (bn256, arity 8)."""
    t = Trie(store)
    assert t.empty_root_for_height(0) == 0
    assert t.empty_root_for_height(1) == int(
        "1ca5b207085f3f0f324a2e0704b18fff1cda2e2d686aa85343fea91df77bf35b",
        16)
    assert t.empty_root_for_height(2) == int(
        "0637ddaef5cd53ba6711c328952208d846222066701e10c34d3a6df7350de8aa",
        16)
    assert t.empty_root_for_height(3) == int(
        "08127a45502f5939273edd1957c8748ae39992e2a459d99f999992a842df99a5",
        16)
    assert t.empty_root_for_height(4) == int(
        "12c2ef2ab5df25442fe23d8711bf985f02c39e83930517f7103d4bd4228c6cfb",
        16)


def test_trie_lookup_insert(store):
    t = Trie(store)
    key, val = 123456789, 987654321
    assert t.lookup(key) is None
    assert t.insert(key, val)
    assert t.lookup(key) == val
    # other keys still empty
    assert t.lookup(key + 1) is None
    # reopen from root
    t2 = Trie(store, t.root)
    assert t2.lookup(key) == val
    # overwrite
    t2.insert(key, 42)
    assert t2.lookup(key) == 42


def test_trie_coprocessors_in_eval(store):
    lang, new_sym, lookup_sym, insert_sym = install_trie_lang()
    setup = LangSetup.ivc(lang)
    # (.lurk.trie.new) -> empty root num
    expr = store.list([store.intern_symbol(new_sym)])
    frames = evaluate(setup, expr, store, 100)
    out = frames[-1].output
    assert out[2].tag == ContTag.Terminal
    root = store.fetch_num(out[0])
    assert root == Trie(store).root
    # insert then lookup through full Lurk evaluation
    root_ptr = out[0]
    key = store.num(7)
    val = store.num(99)
    quote = store.intern_lurk_symbol("quote")
    ins = store.list([store.intern_symbol(insert_sym), root_ptr, key, val])
    frames = evaluate(setup, ins, store, 100)
    new_root = frames[-1].output[0]
    assert frames[-1].output[2].tag == ContTag.Terminal
    look = store.list([store.intern_symbol(lookup_sym), new_root, key])
    frames = evaluate(setup, look, store, 100)
    res = frames[-1].output[0]
    assert store.atoms[res.idx] == 99


def test_sha256_coprocessor_eval(store):
    import hashlib
    lang = Lang()
    sym = user_sym("sha256_2")
    lang.add_coprocessor(sym, sha256_coprocessor(2))
    setup = LangSetup.ivc(lang)
    expr = store.list([store.intern_symbol(sym), store.num(1),
                       store.num(2)])
    frames = evaluate(setup, expr, store, 100)
    out = frames[-1].output
    assert out[2].tag == ContTag.Terminal
    got = store.fetch_num(out[0])
    # host recomputation of the reference byte layout
    z1 = store.hash_ptr(store.num(1))
    z2 = store.hash_ptr(store.num(2))
    buf = bytearray()
    for z in (z1, z2):
        buf += int(z.tag).to_bytes(32, "little")
        buf += z.digest.to_bytes(32, "little")
    buf.reverse()
    v = int.from_bytes(hashlib.sha256(bytes(buf)).digest(), "big")
    capacity = BN256_SCALAR.num_bits - 1
    assert got == v & ((1 << capacity) - 1)


def test_nivc_cproc_frames(store):
    """NIVC mode: coprocessor steps get pc != 0 and run via run_cproc."""
    from lurk_tpu.lem.evaluation import build_frames, get_pc
    lang = Lang()
    sym = user_sym("sha256_1")
    lang.add_coprocessor(sym, sha256_coprocessor(1))
    setup = LangSetup.nivc(lang)
    expr = store.list([store.intern_symbol(sym), store.num(5)])
    from lurk_tpu.lem.interpreter import dummy_channel
    frames = build_frames(setup.lurk_step, setup.cprocs,
                          [expr, store.intern_empty_env(),
                           store.cont_outermost()],
                          store, 100, setup.lang, dummy_channel())
    assert frames[-1].output[2].tag == ContTag.Terminal
    pcs = [f.pc for f in frames]
    assert any(pc == 1 for pc in pcs), f"no cproc frame: {pcs}"
