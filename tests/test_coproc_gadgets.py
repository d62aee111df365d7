"""Coprocessor gadget library: in-circuit construction matches store
interning digests."""

import pytest

from lurk_tpu.coproc.gadgets import (
    construct_cons, construct_list, deconstruct_tuple2,
)
from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.lem.circuit import SlotCounters, Synthesizer, SynthesisCtx
from lurk_tpu.r1cs.cs import ConstraintSystem
from lurk_tpu.r1cs.gadgets import Bool
from lurk_tpu.store.core import Store


@pytest.fixture()
def synth():
    store = Store(BN256_SCALAR, use_device=False)
    cs = ConstraintSystem(BN256_SCALAR, check=True)
    ctx = SynthesisCtx(cs=cs, store=store, slots={}, blank=False,
                       hint_bindings={}, cproc_synthesizers={})
    return Synthesizer(ctx)


def test_construct_cons_matches_store(synth):
    s = synth.store
    a, b = s.num(1), s.num(2)
    expected = s.hash_ptr(s.cons(a, b))
    pa = synth.const_for_ptr(a)
    pb = synth.const_for_ptr(b)
    out = construct_cons(synth, pa, pb)
    assert out.hash.value == expected.digest
    assert out.tag.value == expected.tag
    assert synth.cs.is_satisfied()


def test_construct_list_matches_store(synth):
    s = synth.store
    elts = [s.num(i) for i in range(3)]
    expected = s.hash_ptr(s.list(elts))
    out = construct_list(synth, [synth.const_for_ptr(e) for e in elts])
    assert out.hash.value == expected.digest
    assert synth.cs.is_satisfied()


def test_deconstruct_tuple2(synth):
    s = synth.store
    a, b = s.num(7), s.num(8)
    pair = s.cons(a, b)
    img = synth.const_for_ptr(pair)
    ca, cb = deconstruct_tuple2(synth, Bool.true(), img, (a, b))
    assert ca.hash.value == 7 and cb.hash.value == 8
    assert synth.cs.is_satisfied()
