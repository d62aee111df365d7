"""Poseidon hash as R1CS constraints.

Replaces neptune's `circuit2::poseidon_hash_allocated`
(/root/reference/src/lem/circuit.rs:34,221-240) with a direct synthesis of
the unoptimized-but-equivalent permutation over
:mod:`lurk_tpu.r1cs.cs`: round constants and the MDS mix stay inside
linear combinations (free), each S-box costs exactly 3 constraints/aux
(x2 = x*x, x4 = x2*x2, x5 = x4*x).

The aux layout is deterministic — for each round, for each S-boxed lane:
x2, x4, x5 — so a batched device kernel can generate the identical witness
trace (see :func:`witness_trace`).
"""

from __future__ import annotations

from typing import List, Sequence

from ..fields import FieldSpec
from ..r1cs.cs import lc_add, lc_scale
from ..r1cs.gadgets import ConstraintSystem, Num, alloc_num, mul
from .spec import PoseidonSpec, poseidon_spec

# aux variables per S-box (x2, x4, x5)
AUX_PER_SBOX = 3


def num_sboxes(spec: PoseidonSpec) -> int:
    return spec.width * spec.full_rounds + spec.partial_rounds


def num_aux(spec: PoseidonSpec) -> int:
    """Aux variables allocated by poseidon_circuit (excluding preimage)."""
    return AUX_PER_SBOX * num_sboxes(spec)


def _sbox(cs: ConstraintSystem, x: Num) -> Num:
    x2 = mul(cs, x, x)
    x4 = mul(cs, x2, x2)
    return mul(cs, x4, x)


def poseidon_circuit(cs: ConstraintSystem, field: FieldSpec,
                     preimage: Sequence[Num]) -> Num:
    """Constrain the Neptune-compatible constant-length hash of
    ``len(preimage)`` elements; returns the digest as an (unallocated) LC."""
    spec = poseidon_spec(field, len(preimage))
    p = cs.p
    t = spec.width
    rc = spec.round_constants
    half_full = spec.full_rounds // 2
    state: List[Num] = [Num.constant(cs, spec.domain_tag), *preimage]
    off = 0

    def add_rc(st: List[Num], off: int) -> int:
        for i in range(t):
            c = rc[off + i] % p
            st[i] = Num(
                lc_add(st[i].lc, {ConstraintSystem.ONE_VAR: c}, p),
                (st[i].value + c) % p)
        return off + t

    def mds(st: List[Num]) -> List[Num]:
        out = []
        for j in range(t):
            lc = {}
            val = 0
            for i in range(t):
                m = spec.mds[i][j]
                lc = lc_add(lc, lc_scale(st[i].lc, m, p), p)
                val = (val + m * st[i].value) % p
            out.append(Num(lc, val))
        return out

    for _ in range(half_full):
        off = add_rc(state, off)
        state = [_sbox(cs, x) for x in state]
        state = mds(state)
    for _ in range(spec.partial_rounds):
        off = add_rc(state, off)
        state[0] = _sbox(cs, state[0])
        state = mds(state)
    for _ in range(half_full):
        off = add_rc(state, off)
        state = [_sbox(cs, x) for x in state]
        state = mds(state)
    assert off == len(rc)
    return state[1]


def poseidon_witness(cs: ConstraintSystem, field: FieldSpec,
                     preimage: Sequence[Num]) -> Num:
    """Witness-only fast path (neptune circuit2_witness
    `poseidon_hash_allocated_witness` parity, /root/reference/src/circuit/
    gadgets/hashes.rs:6): pushes the identical aux trace as
    :func:`poseidon_circuit` (values only, no linear-combination algebra
    — the dominant cost of full synthesis) and returns the digest value.
    Only valid on a ``witness_only`` ConstraintSystem."""
    assert cs.witness_only
    values = [x.value for x in preimage]
    from ..native import poseidon as npos
    if npos.available():
        trace, digest = npos.witness_trace_and_digest(field, values)
    else:
        trace, digest = witness_trace_and_digest(field, values)
    cs.aux.extend(trace)
    return Num({}, digest)


def witness_trace(field: FieldSpec, preimage: Sequence[int]) -> List[int]:
    return witness_trace_and_digest(field, preimage)[0]


def witness_trace_and_digest(field: FieldSpec,
                             preimage: Sequence[int]):
    """Host oracle for the aux trace of :func:`poseidon_circuit` in
    allocation order; the batched device kernel must reproduce this."""
    spec = poseidon_spec(field, len(preimage))
    p = field.modulus
    t = spec.width
    rc = spec.round_constants
    half_full = spec.full_rounds // 2
    state = [spec.domain_tag, *[x % p for x in preimage]]
    off = 0
    trace: List[int] = []

    def sbox(x: int) -> int:
        x2 = x * x % p
        x4 = x2 * x2 % p
        x5 = x4 * x % p
        trace.extend((x2, x4, x5))
        return x5

    def mds(st):
        return [sum(spec.mds[i][j] * st[i] for i in range(t)) % p
                for j in range(t)]

    for _ in range(half_full):
        state = [(x + rc[off + i]) % p for i, x in enumerate(state)]
        off += t
        state = mds([sbox(x) for x in state])
    for _ in range(spec.partial_rounds):
        state = [(x + rc[off + i]) % p for i, x in enumerate(state)]
        off += t
        state[0] = sbox(state[0])
        state = mds(state)
    for _ in range(half_full):
        state = [(x + rc[off + i]) % p for i, x in enumerate(state)]
        off += t
        state = mds([sbox(x) for x in state])
    return trace, state[1]
