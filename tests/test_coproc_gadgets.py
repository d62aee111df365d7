"""Coprocessor gadget library: in-circuit construction matches store
interning digests."""

import pytest

from lurk_tpu.coproc.gadgets import (
    car_cdr, car_cdr_simple, chain_car_cdr, construct_cons,
    construct_list, deconstruct_tuple2, deconstruct_tuple3,
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


def _z(synth, ptr):
    z = synth.store.hash_ptr(ptr)
    return (z.tag, z.digest)


def _a(aptr):
    return (aptr.tag.value, aptr.hash.value)


def test_deconstruct_tuple3(synth):
    """gadgets.rs:368-414: a raw hash6 3-tuple deconstructs to its
    children; wrong advice under a TRUE premise must not satisfy."""
    s = synth.store
    a, b, c = s.num(7), s.num(8), s.num(9)
    from lurk_tpu.tags import ExprTag
    t3 = s.intern_tuple3([a, b, c], ExprTag.Cproc)
    img = synth.const_for_ptr(t3)
    ca, cb, cc = deconstruct_tuple3(synth, Bool.true(), img, (a, b, c))
    assert (ca.hash.value, cb.hash.value, cc.hash.value) == (7, 8, 9)
    assert synth.cs.is_satisfied()
    from lurk_tpu.r1cs.cs import SynthesisError
    with pytest.raises(SynthesisError):
        deconstruct_tuple3(synth, Bool.true(), img, (a, b, a))


def test_car_cdr_gadget(synth):
    """Mirrors gadgets.rs test_car_cdr: nil, cons, empty string,
    non-empty string."""
    s = synth.store
    nil = s.intern_nil()
    empty = s.intern_string("")
    true = Bool.true()

    a_nil = synth.const_for_ptr(nil)
    car, cdr, not_empty = car_cdr(synth, true, a_nil, nil)
    assert _a(car) == _z(synth, nil) and _a(cdr) == _z(synth, nil)
    assert not not_empty.value

    one = s.num_u64(1)
    cons = s.cons(one, one)
    a_cons = synth.const_for_ptr(cons)
    car, cdr, not_empty = car_cdr(synth, true, a_cons, cons)
    assert _a(car) == _z(synth, one) and _a(cdr) == _z(synth, one)
    assert not_empty.value

    a_empty = synth.const_for_ptr(empty)
    car, cdr, not_empty = car_cdr(synth, true, a_empty, empty)
    assert _a(car) == _z(synth, nil) and _a(cdr) == _z(synth, empty)
    assert not not_empty.value

    abc = s.intern_string("abc")
    bc = s.intern_string("bc")
    ch_a = s.char("a")
    a_abc = synth.const_for_ptr(abc)
    car, cdr, not_empty = car_cdr(synth, true, a_abc, abc)
    assert _a(car) == _z(synth, ch_a) and _a(cdr) == _z(synth, bc)
    assert not_empty.value
    assert synth.cs.is_satisfied()


def test_car_cdr_simple_gadget(synth):
    s = synth.store
    nil = s.intern_nil()
    true = Bool.true()
    one = s.num_u64(1)
    two = s.num_u64(2)
    cons = s.cons(one, two)
    car, cdr, not_nil = car_cdr_simple(synth, true,
                                       synth.const_for_ptr(cons), cons)
    assert _a(car) == _z(synth, one) and _a(cdr) == _z(synth, two)
    assert not_nil.value
    car, cdr, not_nil = car_cdr_simple(synth, true,
                                       synth.const_for_ptr(nil), nil)
    assert _a(car) == _z(synth, nil) and not not_nil.value
    assert synth.cs.is_satisfied()


def test_chain_car_cdr_gadget(synth):
    """Mirrors gadgets.rs test_chain_car_cdr: 'ab' with n=4 explores
    length 2, cars [a, b, nil, nil], final cdr ''."""
    s = synth.store
    true = Bool.true()
    ab = s.intern_string("ab")
    cars, cdr, length = chain_car_cdr(synth, true,
                                      synth.const_for_ptr(ab), ab, 4)
    assert len(cars) == 4
    assert _a(cars[0]) == _z(synth, s.char("a"))
    assert _a(cars[1]) == _z(synth, s.char("b"))
    nil = s.intern_nil()
    assert _a(cars[2]) == _z(synth, nil)
    assert _a(cars[3]) == _z(synth, nil)
    assert _a(cdr) == _z(synth, s.intern_string(""))
    assert length.value == 2
    # list variant with simple car_cdr
    lst = s.list([ab, ab])
    cars, cdr, length = chain_car_cdr(synth, true,
                                      synth.const_for_ptr(lst), lst, 3,
                                      simple=True)
    assert _a(cars[0]) == _z(synth, ab) and _a(cars[1]) == _z(synth, ab)
    assert _a(cdr) == _z(synth, nil)
    assert length.value == 2
    assert synth.cs.is_satisfied()
