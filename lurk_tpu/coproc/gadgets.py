"""Reusable allocation gadgets for coprocessor circuits.

Parity: /root/reference/src/coprocessor/gadgets.rs:23-728 — helpers a
CoCircuit author uses to build/deconstruct Lurk data in-circuit:
construct_cons / construct_list / construct_env / construct_provenance,
deconstruct_tuple2/3/4, car_cdr (string-aware semantics of the Car/Cdr
path is the caller's concern here; this module exposes the hash-level
building blocks).

Unlike the LEM compiler's slot machinery (shared Poseidon instances),
these gadgets synthesize DEDICATED Poseidon instances — matching the
reference, where coprocessor gadgets hash outside the slot system.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from ..lem.circuit import AllocatedPtr, Synthesizer
from ..poseidon.circuit import poseidon_circuit
from ..r1cs.gadgets import Bool, Num, alloc_num, enforce_equal, \
    implies_equal
from ..store.core import Store
from ..tags import ExprTag


def hash_nums(synth: Synthesizer, preimage: Sequence[Num]) -> Num:
    """Dedicated Poseidon instance over `len(preimage)` field elements."""
    if synth.cs.witness_only:
        from ..poseidon.circuit import poseidon_witness
        return poseidon_witness(synth.cs, synth.store.field,
                                list(preimage))
    return poseidon_circuit(synth.cs, synth.store.field, list(preimage))


def construct_tuple2(synth: Synthesizer, tag: int, a: AllocatedPtr,
                     b: AllocatedPtr) -> AllocatedPtr:
    digest = hash_nums(synth, [a.tag, a.hash, b.tag, b.hash])
    return AllocatedPtr(Num.constant(synth.cs, int(tag)), digest)


def construct_cons(synth: Synthesizer, car: AllocatedPtr,
                   cdr: AllocatedPtr) -> AllocatedPtr:
    return construct_tuple2(synth, ExprTag.Cons, car, cdr)


def construct_tuple3(synth: Synthesizer, tag: int, a: AllocatedPtr,
                     b: AllocatedPtr, c: AllocatedPtr) -> AllocatedPtr:
    digest = hash_nums(
        synth, [a.tag, a.hash, b.tag, b.hash, c.tag, c.hash])
    return AllocatedPtr(Num.constant(synth.cs, int(tag)), digest)


def construct_tuple4(synth: Synthesizer, tag: int, a: AllocatedPtr,
                     b: AllocatedPtr, c: AllocatedPtr,
                     d: AllocatedPtr) -> AllocatedPtr:
    digest = hash_nums(synth, [a.tag, a.hash, b.tag, b.hash, c.tag,
                               c.hash, d.tag, d.hash])
    return AllocatedPtr(Num.constant(synth.cs, int(tag)), digest)


def construct_env(synth: Synthesizer, sym_hash: Num, val: AllocatedPtr,
                  rest_env_hash: Num) -> AllocatedPtr:
    """Env compact hashing: hash4([sym_digest, val.tag, val.digest,
    env_digest]) (store.rs hasher parity)."""
    digest = hash_nums(synth, [sym_hash, val.tag, val.hash,
                               rest_env_hash])
    return AllocatedPtr(Num.constant(synth.cs, int(ExprTag.Env)), digest)


def construct_provenance(synth: Synthesizer, query_hash: Num,
                         result: AllocatedPtr,
                         deps_hash: Num) -> AllocatedPtr:
    digest = hash_nums(synth, [query_hash, result.tag, result.hash,
                               deps_hash])
    return AllocatedPtr(Num.constant(synth.cs, int(ExprTag.Prov)), digest)


def construct_list(synth: Synthesizer, elts: Sequence[AllocatedPtr],
                   last: Optional[AllocatedPtr] = None) -> AllocatedPtr:
    store = synth.store
    if last is None:
        acc = synth.const_for_ptr(store.intern_nil())
    else:
        acc = last
    for elt in reversed(list(elts)):
        acc = construct_cons(synth, elt, acc)
    return acc


def _advice_ptr(synth: Synthesizer, ptr) -> AllocatedPtr:
    z = synth.store.hash_ptr(ptr)
    from ..lem.circuit import alloc_ptr
    return alloc_ptr(synth.cs, z.tag, z.digest)


def deconstruct_tuple2(synth: Synthesizer, not_dummy: Bool,
                       img: AllocatedPtr, children) -> Tuple[AllocatedPtr,
                                                             AllocatedPtr]:
    """Allocate children (advice), re-hash, and enforce (under
    not_dummy) that the hash equals img's digest."""
    a = _advice_ptr(synth, children[0])
    b = _advice_ptr(synth, children[1])
    digest = hash_nums(synth, [a.tag, a.hash, b.tag, b.hash])
    implies_equal(synth.cs, not_dummy, img.hash, digest)
    return a, b


def deconstruct_tuple4(synth: Synthesizer, not_dummy: Bool,
                       img: AllocatedPtr, children):
    ptrs = [_advice_ptr(synth, c) for c in children]
    pre: List[Num] = []
    for p in ptrs:
        pre.extend((p.tag, p.hash))
    digest = hash_nums(synth, pre)
    implies_equal(synth.cs, not_dummy, img.hash, digest)
    return tuple(ptrs)
