"""MemosetProver: NIVC folding over CoroutineCircuit steps.

Parity: /root/reference/src/coroutine/memoset/prove.rs — each chunk of
up to `rc` unique keys of one query index becomes one SuperNova step
(circuit_index = query index); the z vector is 6 ptrs (12 scalars):

    z0 = [dummy, dummy, dummy, init_memoset, init_transcript, (Cons, r)]

and the verifier accepts iff the fold chains + IO linkage hold AND the
final z shows a balanced LogUp accumulator (acc == Num 0) with the
transcript digest equal to the Fiat-Shamir r it was folded under.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

from ..proof.nova import (
    CommitmentKey, R1CSInstance, R1CSShape, RelaxedInstance,
    RelaxedWitness, check_relaxed, check_strict, cross_term,
    fold_challenge, fold_instance, fold_witness,
)
from ..store.core import Ptr, Store
from ..tags import ExprTag
from .circuit import CircuitQuery, CoroutineCircuit
from .memoset import Scope

COROUTINE_ARITY = 12    # 6 tagged pointers


@dataclasses.dataclass
class MemosetPublicParams:
    shapes: Dict[int, R1CSShape]
    ck: CommitmentKey
    curve: object

    @staticmethod
    def setup(shapes: Dict[int, R1CSShape]) -> "MemosetPublicParams":
        from ..curves.weierstrass import CURVE_FOR_FIELD
        any_shape = next(iter(shapes.values()))
        curve = CURVE_FOR_FIELD[any_shape.field.name]
        n = max(max(s.num_aux, s.num_constraints, s.num_inputs, 2)
                for s in shapes.values())
        n = 1 << (n - 1).bit_length()
        ck = CommitmentKey.setup(
            curve, b"lurk_tpu.ck." + curve.name.encode(), n)
        return MemosetPublicParams(shapes, ck, curve)


@dataclasses.dataclass
class MemosetProof:
    steps: List[Tuple[int, R1CSInstance, object]]
    final_witnesses: Dict[int, RelaxedWitness]
    z0: List[int]
    zi: List[int]


class MemosetProver:
    """Prove a finalized Scope's query set (prove.rs:209-241)."""

    def __init__(self, rc: int, circuit_query: CircuitQuery,
                 check_steps: bool = False):
        self.rc = rc
        self.circuit_query = circuit_query
        self.check_steps = check_steps

    def z0(self, scope: Scope) -> List[int]:
        s = scope.store
        dummy = s.hash_ptr(s.intern_nil())
        tr0 = s.hash_ptr(scope.init_transcript_ptr())
        return [
            dummy.tag, dummy.digest, dummy.tag, dummy.digest,
            dummy.tag, dummy.digest,
            int(ExprTag.Num), scope.init_memoset(),
            tr0.tag, tr0.digest,
            int(ExprTag.Cons), scope.r,
        ]

    def prove_from_scope(self, scope: Scope
                         ) -> Tuple[MemosetPublicParams, MemosetProof]:
        assert scope.default_rc == self.rc, \
            "scope rc must match prover rc (transcript padding)"
        s = scope.store
        if scope.transcript is None:
            scope.finalize_transcript()
        s.hydrate_z_cache()
        p = s.field.modulus
        r = scope.r
        # step circuits: per index, chunks of rc unique keys
        steps: List[CoroutineCircuit] = []
        for index in sorted(scope.unique_inserted_keys):
            keys = scope.unique_inserted_keys[index]
            cq = self.circuit_query.for_index(index)
            for start in range(0, len(keys), self.rc):
                steps.append(CoroutineCircuit(
                    scope, keys[start:start + self.rc], index, self.rc,
                    cq))
        # host-side z chaining (mirrors the in-circuit updates)
        z = self.z0(scope)

        def elem(prov: Ptr) -> int:
            x = s.hash_ptr(prov).digest
            return pow((r + x) % p, p - 2, p)

        shapes: Dict[int, R1CSShape] = {}
        instances = []
        tr_ptr = scope.init_transcript_ptr()
        for step in steps:
            acc = z[7]
            # recompute z_out on the host: acc/transcript evolve per key
            # slot (mirrors CoroutineCircuit.synthesize)
            for i in range(step.rc):
                key = step.keys[i] if i < len(step.keys) else None
                if key is not None:
                    prov = scope._provenances[key]
                    count = scope._removal_counts.get(key, 0)
                    # dependency insertions of this key's proven eval
                    for dep in scope.dependencies.get(key, []):
                        acc = (acc + elem(
                            scope._provenances[dep.to_ptr(s)])) % p
                    acc = (acc - count * elem(prov)) % p
                else:
                    prov = None
                    count = 0
                from .memoset import Provenance, Transcript
                eff = prov if prov is not None else \
                    Provenance.dummy(s).to_ptr(s)
                pc_ptr = Transcript.make_provenance_count(s, eff, count)
                tr_ptr = s.cons(pc_ptr, tr_ptr)
            s.hydrate_z_cache()
            z_out = list(z)
            z_out[7] = acc
            z_out[8] = s.hash_ptr(tr_ptr).tag
            z_out[9] = s.hash_ptr(tr_ptr).digest
            x, w, cs = step.instance(z, z_out,
                                     shape_check=self.check_steps)
            if step.index not in shapes:
                shapes[step.index] = R1CSShape(cs)
            else:
                assert shapes[step.index].digest == cs.shape_digest(), \
                    "non-uniform coroutine circuit"
            instances.append((step.index, x, w))
            z = z_out
        pp = MemosetPublicParams.setup(shapes)
        acc_inst: Dict[int, RelaxedInstance] = {
            i: RelaxedInstance.default(s_) for i, s_ in shapes.items()}
        acc_wit: Dict[int, RelaxedWitness] = {
            i: RelaxedWitness.default(s_) for i, s_ in shapes.items()}
        proof_steps = []
        for idx, x, w in instances:
            shape = shapes[idx]
            if self.check_steps:
                assert check_strict(shape, x, w), "unsat coroutine step"
            comm_w = pp.ck.commit(w)
            inst = R1CSInstance(comm_w, list(x))
            t = cross_term(shape, acc_inst[idx], acc_wit[idx], x, w)
            comm_t = pp.ck.commit(t)
            rr = fold_challenge(pp.curve, shape.digest, acc_inst[idx],
                                inst, comm_t)
            acc_inst[idx] = fold_instance(pp.curve, acc_inst[idx], inst,
                                          comm_t, rr, shape.p)
            acc_wit[idx] = fold_witness(shape.p, acc_wit[idx], w, t, rr)
            proof_steps.append((idx, inst, comm_t))
        return pp, MemosetProof(proof_steps, acc_wit, self.z0(scope), z)


def verify(pp: MemosetPublicParams, proof: MemosetProof) -> bool:
    """Fold chains + IO linkage + the memoset final-state checks."""
    n = COROUTINE_ARITY
    xs = [inst.x for _, inst, _ in proof.steps]
    if not xs or xs[0][:n] != list(proof.z0):
        return False
    for prev, cur in zip(xs, xs[1:]):
        if prev[n:] != cur[:n]:
            return False
    if xs[-1][n:] != list(proof.zi):
        return False
    zi = proof.zi
    # balanced multiset: acc == (Num, 0)
    if zi[6] != int(ExprTag.Num) or zi[7] != 0:
        return False
    # Fiat-Shamir binding: transcript digest == r (z0 and zi agree on r)
    if zi[10] != int(ExprTag.Cons) or zi[11] != zi[9]:
        return False
    if proof.z0[10] != int(ExprTag.Cons) or proof.z0[11] != zi[11]:
        return False
    acc: Dict[int, RelaxedInstance] = {
        i: RelaxedInstance.default(s_) for i, s_ in pp.shapes.items()}
    for idx, inst, comm_t in proof.steps:
        shape = pp.shapes.get(idx)
        if shape is None or len(inst.x) != shape.num_inputs - 1:
            return False
        r = fold_challenge(pp.curve, shape.digest, acc[idx], inst,
                           comm_t)
        acc[idx] = fold_instance(pp.curve, acc[idx], inst, comm_t, r,
                                 shape.p)
    for idx, shape in pp.shapes.items():
        wit = proof.final_witnesses[idx]
        if not check_relaxed(shape, acc[idx], wit):
            return False
        if pp.ck.commit(wit.w) != acc[idx].comm_w:
            return False
        if pp.ck.commit(wit.e) != acc[idx].comm_e:
            return False
    return True
