"""MemosetCycleProver: memoset coroutines on the SuperNova cycle.

The O(#indices) analogue of coroutine/prove.py — each CoroutineCircuit
chunk becomes the step function of one SuperNova augmented circuit
(proof/supernova_cycle.py), exactly how the reference rides arecibo's
supernova (prove.rs:59-147). z = the 6 memoset pointers (12 scalars);
the verifier additionally checks the final LogUp state: acc == (Num, 0)
and transcript digest == r.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

from ..proof.supernova_cycle import (
    SnCyclePublicParams, SnCycleProof, SnCycleSNARK,
    verify as sn_cycle_verify,
)
from ..store.core import Ptr, Store
from ..tags import ExprTag
from .circuit import CircuitQuery, CoroutineCircuit
from .memoset import Provenance, Scope, Transcript
from .prove import COROUTINE_ARITY, MemosetProver


def _coroutine_step_fn():
    """step(cs, zi_nums, aux=(CoroutineCircuit, next_index))."""
    from ..lem.circuit import AllocatedPtr
    from ..r1cs.gadgets import alloc_num

    def step(cs, zi, aux):
        circuit, next_idx = aux
        ptrs = [AllocatedPtr(zi[2 * i], zi[2 * i + 1]) for i in range(6)]
        outs = circuit.synthesize_with_inputs(cs, ptrs)
        flat = []
        for ptr in outs:
            flat.extend((ptr.tag, ptr.hash))
        return flat, alloc_num(cs, next_idx)

    return step


class MemosetCycleProver(MemosetProver):
    """Prove a finalized Scope with O(#indices) proof size."""

    _PP_CACHE: Dict[tuple, SnCyclePublicParams] = {}

    def _public_params(self, scope: Scope, n_circuits: int
                       ) -> SnCyclePublicParams:
        s = scope.store
        key = (s.field.name, self.rc, type(self.circuit_query).__name__,
               n_circuits)
        pp = self._PP_CACHE.get(key)
        if pp is not None:
            return pp
        step_fns = [_coroutine_step_fn() for _ in range(n_circuits)]
        dummy_auxes = []
        for index in range(n_circuits):
            cq = self.circuit_query.for_index(index)
            dummy_auxes.append(
                (CoroutineCircuit(scope, [], index, self.rc, cq), 0))
        pp = SnCyclePublicParams.setup(
            s.field, COROUTINE_ARITY, step_fns, self.z0(scope),
            dummy_auxes, base_allowed=True)
        self._PP_CACHE[key] = pp
        return pp

    def prove_from_scope(self, scope: Scope
                         ) -> Tuple[SnCyclePublicParams, SnCycleProof]:
        assert scope.default_rc == self.rc, \
            "scope rc must match prover rc (transcript padding)"
        s = scope.store
        if scope.transcript is None:
            scope.finalize_transcript()
        s.hydrate_z_cache()
        p = s.field.modulus
        r = scope.r
        indices = sorted(scope.unique_inserted_keys)
        n_circuits = (max(indices) + 1) if indices else 1
        steps: List[CoroutineCircuit] = []
        for index in indices:
            keys = scope.unique_inserted_keys[index]
            cq = self.circuit_query.for_index(index)
            for start in range(0, len(keys), self.rc):
                steps.append(CoroutineCircuit(
                    scope, keys[start:start + self.rc], index, self.rc,
                    cq))
        pp = self._public_params(scope, n_circuits)
        z = self.z0(scope)
        snark = SnCycleSNARK(pp, z,
                             initial_pc=steps[0].index if steps else 0)

        def elem(prov: Ptr) -> int:
            x = s.hash_ptr(prov).digest
            return pow((r + x) % p, p - 2, p)

        tr_ptr = scope.init_transcript_ptr()
        for k, step in enumerate(steps):
            acc = z[7]
            for i in range(step.rc):
                key = step.keys[i] if i < len(step.keys) else None
                if key is not None:
                    prov = scope._provenances[key]
                    count = scope._removal_counts.get(key, 0)
                    for dep in scope.dependencies.get(key, []):
                        acc = (acc + elem(
                            scope._provenances[dep.to_ptr(s)])) % p
                    acc = (acc - count * elem(prov)) % p
                else:
                    prov, count = None, 0
                eff = prov if prov is not None else \
                    Provenance.dummy(s).to_ptr(s)
                pc_ptr = Transcript.make_provenance_count(s, eff, count)
                tr_ptr = s.cons(pc_ptr, tr_ptr)
            s.hydrate_z_cache()
            z_out = list(z)
            z_out[7] = acc
            z_out[8] = s.hash_ptr(tr_ptr).tag
            z_out[9] = s.hash_ptr(tr_ptr).digest
            next_idx = steps[k + 1].index if k + 1 < len(steps) else 0
            snark.prove_step(step.index, z_out, next_idx,
                             step_aux=(step, next_idx),
                             check=self.check_steps)
            z = z_out
        return pp, snark.finish()


def verify(pp: SnCyclePublicParams, proof: SnCycleProof) -> bool:
    """SuperNova cycle verification + the memoset final-state checks."""
    if not sn_cycle_verify(pp, proof):
        return False
    zn = proof.zn
    if zn[6] != int(ExprTag.Num) or zn[7] != 0:
        return False
    # Fiat-Shamir binding: transcript digest == r; z0 agrees on r
    if zn[10] != int(ExprTag.Cons) or zn[11] != zn[9]:
        return False
    if proof.z0[10] != int(ExprTag.Cons) or proof.z0[11] != zn[11]:
        return False
    return True
