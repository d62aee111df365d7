"""Trie coprocessor circuits: in-circuit Merkle path verification.

Mirrors the reference's CoCircuit impls for New/Lookup/Insert
(/root/reference/src/coprocessor/trie/mod.rs:70-311, 611-890): the
lookup walks 85 poseidon8 levels root->leaf with a constrained 8-way
multiplexer per level; insert re-hashes the modified path bottom-up.
"""

import os

import pytest

from lurk_tpu.coproc.trie import (
    InsertCircuit, LookupCircuit, NewCircuit, Trie, install_trie_lang,
)
from lurk_tpu.fields import PALLAS_SCALAR
from lurk_tpu.lem.circuit import AllocatedPtr
from lurk_tpu.r1cs.cs import ConstraintSystem
from lurk_tpu.r1cs.gadgets import Num, alloc_bit, alloc_num
from lurk_tpu.store.core import Store
from lurk_tpu.tags import ExprTag


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    os.environ.setdefault(
        "LURK_TPU_CACHE", str(tmp_path_factory.mktemp("pp_cache")))
    return Store(PALLAS_SCALAR, use_device=False)


class _ShimCtx:
    blank = False


class _ShimSynth:
    """Just enough of lem.circuit.Synthesizer for CoCircuit synthesis."""

    def __init__(self, cs, store, blank=False):
        self.cs = cs
        self.store = store
        self.ctx = _ShimCtx()
        self.ctx.blank = blank


def _ptr(cs, tag, value):
    return AllocatedPtr(Num.constant(cs, int(tag)), alloc_num(cs, value))


def _passthrough(cs):
    return _ptr(cs, ExprTag.Env, 0), _ptr(cs, 0x1000, 0)


def test_lookup_circuit_satisfied(store):
    t = Trie(store)
    t.insert(5, 123)
    t.insert((1 << 200) + 7, 456)
    cs = ConstraintSystem(PALLAS_SCALAR)
    synth = _ShimSynth(cs, store)
    not_dummy = alloc_bit(cs, True)
    env, cont = _passthrough(cs)
    root = _ptr(cs, ExprTag.Num, t.root)
    key = _ptr(cs, ExprTag.Num, (1 << 200) + 7)
    out = LookupCircuit().synthesize(synth, not_dummy, [root, key,
                                                        env, cont])
    assert cs.is_satisfied()
    assert out[0].hash.value == 456
    assert out[0].tag.value == int(ExprTag.Comm)
    assert out[1] is env and out[2] is cont


def test_lookup_missing_key_gives_zero(store):
    t = Trie(store)
    t.insert(5, 123)
    cs = ConstraintSystem(PALLAS_SCALAR)
    synth = _ShimSynth(cs, store)
    not_dummy = alloc_bit(cs, True)
    env, cont = _passthrough(cs)
    out = LookupCircuit().synthesize(
        synth, not_dummy,
        [_ptr(cs, ExprTag.Num, t.root), _ptr(cs, ExprTag.Num, 99),
         env, cont])
    assert cs.is_satisfied()
    assert out[0].hash.value == 0


def test_insert_circuit_matches_host(store):
    t = Trie(store)
    t.insert(5, 123)
    root_before = t.root
    t2 = Trie(store, root_before)
    t2.insert(42, 777)
    cs = ConstraintSystem(PALLAS_SCALAR)
    synth = _ShimSynth(cs, store)
    not_dummy = alloc_bit(cs, True)
    env, cont = _passthrough(cs)
    out = InsertCircuit().synthesize(
        synth, not_dummy,
        [_ptr(cs, ExprTag.Num, root_before), _ptr(cs, ExprTag.Num, 42),
         _ptr(cs, ExprTag.Num, 777), env, cont])
    assert cs.is_satisfied()
    assert out[0].hash.value == t2.root
    assert out[0].tag.value == int(ExprTag.Num)


def test_new_circuit_constant_root(store):
    cs = ConstraintSystem(PALLAS_SCALAR)
    synth = _ShimSynth(cs, store)
    not_dummy = alloc_bit(cs, True)
    env, cont = _passthrough(cs)
    out = NewCircuit().synthesize(synth, not_dummy, [env, cont])
    assert cs.is_satisfied()
    assert out[0].hash.value == Trie(store).root


def test_dummy_and_blank_modes_satisfiable(store):
    # virtual path: not_dummy = False with garbage inputs
    cs = ConstraintSystem(PALLAS_SCALAR)
    synth = _ShimSynth(cs, store)
    not_dummy = alloc_bit(cs, False)
    env, cont = _passthrough(cs)
    LookupCircuit().synthesize(
        synth, not_dummy,
        [_ptr(cs, ExprTag.Num, 31337), _ptr(cs, ExprTag.Num, 911),
         env, cont])
    assert cs.is_satisfied()
    # blank circuit: same constraint count as a concrete one (shape
    # stability across frames)
    t = Trie(store)
    t.insert(5, 123)
    cs_blank = ConstraintSystem(PALLAS_SCALAR)
    synth_b = _ShimSynth(cs_blank, store, blank=True)
    nd = alloc_bit(cs_blank, False)
    env_b, cont_b = _passthrough(cs_blank)
    LookupCircuit().synthesize(
        synth_b, nd,
        [_ptr(cs_blank, ExprTag.Num, 0), _ptr(cs_blank, ExprTag.Num, 0),
         env_b, cont_b])
    cs_real = ConstraintSystem(PALLAS_SCALAR)
    synth_r = _ShimSynth(cs_real, store)
    nd_r = alloc_bit(cs_real, True)
    env_r, cont_r = _passthrough(cs_real)
    LookupCircuit().synthesize(
        synth_r, nd_r,
        [_ptr(cs_real, ExprTag.Num, t.root), _ptr(cs_real, ExprTag.Num, 5),
         env_r, cont_r])
    assert cs_blank.num_constraints == cs_real.num_constraints
    assert cs_blank.num_aux == cs_real.num_aux
    assert cs_blank.is_satisfied() and cs_real.is_satisfied()


def test_trie_lang_has_circuits(store):
    lang, *_ = install_trie_lang()
    assert len(lang.circuit_synthesizers()) == 3
