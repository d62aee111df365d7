"""SuperNova-style non-uniform IVC (NIVC) folding.

Functionality parity target: /root/reference/src/proof/supernova.rs —
per-step circuit selection by program counter, with ONE running relaxed
accumulator per circuit in the `Lang` (the universal Lurk step at pc=0
plus one `run_cproc` circuit per coprocessor). Like nova.py, the verifier
recomputes the fold chain; the in-circuit NIVC verifier is future work.

MultiFrame chunking follows multiframe.rs:300-360: IVC-style chunks of
`rc` frames at pc=0, broken at coprocessor frames (pc != 0), which form
singleton MultiFrames proven against their own circuit.
"""

from __future__ import annotations

from ..utils.tracing import instrument as _trace_instrument

import dataclasses
from typing import Dict, List, Optional, Tuple

from ..lem import ir
from ..lem.eval_step import make_cprocs_funcs, make_eval_step
from ..lem.evaluation import Lang, LangSetup, get_pc
from ..lem.interpreter import Frame
from ..r1cs.cs import ConstraintSystem
from ..store.core import Store
from .multiframe import MultiFrame, io_scalars, pad_frames
from .nova import (
    CommitmentKey, R1CSInstance, R1CSShape, RelaxedInstance,
    RelaxedWitness, check_relaxed, check_strict, cross_term,
    fold_challenge, fold_instance, fold_witness,
)


@dataclasses.dataclass
class FoldingConfig:
    """IVC vs NIVC + rc (proof/supernova.rs:110-137)."""

    lang: Optional[Lang]
    rc: int
    nivc: bool = True


def chunk_frames_nivc(frames: List[Frame], rc: int) -> List[List[Frame]]:
    """Chunks of up to rc pc=0 frames; pc!=0 frames are singletons
    (multiframe.rs:300-360)."""
    chunks: List[List[Frame]] = []
    acc: List[Frame] = []
    for frame in frames:
        if frame.pc == 0:
            acc.append(frame)
            if len(acc) == rc:
                chunks.append(acc)
                acc = []
        else:
            if acc:
                chunks.append(acc)
                acc = []
            chunks.append([frame])
    if acc:
        chunks.append(acc)
    return chunks


@dataclasses.dataclass
class NivcStep:
    """One NIVC folding step: a MultiFrame bound to a circuit index."""

    pc: int
    mframe: MultiFrame


@dataclasses.dataclass
class SuperNovaPublicParams:
    """Aux params + per-circuit shapes/keys (supernova.rs:39-58)."""

    shapes: Dict[int, R1CSShape]
    ck: CommitmentKey
    curve: object

    @staticmethod
    def setup(shapes: Dict[int, R1CSShape]) -> "SuperNovaPublicParams":
        from ..curves.weierstrass import CURVE_FOR_FIELD
        any_shape = next(iter(shapes.values()))
        curve = CURVE_FOR_FIELD[any_shape.field.name]
        n = max(max(s.num_aux, s.num_constraints, s.num_inputs, 2)
                for s in shapes.values())
        n = 1 << (n - 1).bit_length()   # pow2: Spartan/IPA opens padded
        ck = CommitmentKey.setup(curve,
                                 b"lurk_tpu.ck." + curve.name.encode(), n)
        return SuperNovaPublicParams(shapes, ck, curve)

    def params_for(self, pc: int):
        """Single-circuit view (shape, curve, ck) for the compression
        SNARK — nova.PublicParams-compatible."""
        from .nova import PublicParams
        return PublicParams(self.shapes[pc], self.curve, self.ck)


@dataclasses.dataclass
class NivcProof:
    """Per-step (pc, instance, comm_T) + final per-circuit witnesses."""

    steps: List[Tuple[int, R1CSInstance, object]]
    final_witnesses: Dict[int, RelaxedWitness]
    z0: List[int]
    zi: List[int]


class SuperNovaProver:
    """NIVC prover over the Lurk step + per-coprocessor circuits."""

    def __init__(self, rc: int, lang: Lang, check_steps: bool = False):
        self.rc = rc
        self.lang = lang
        self.check_steps = check_steps
        specs = tuple(lang.cproc_specs())
        self.lurk_step = make_eval_step(specs, False)
        self.cprocs = make_cprocs_funcs(specs)

    def setup(self) -> LangSetup:
        return LangSetup(self.lurk_step, self.cprocs, self.lang)

    def _step_func(self, pc: int) -> ir.Func:
        return self.lurk_step if pc == 0 else self.cprocs[pc - 1]

    @_trace_instrument("supernova.prove_from_frames")
    def prove_from_frames(self, store: Store, frames: List[Frame]
                          ) -> Tuple[SuperNovaPublicParams, NivcProof]:
        assert frames
        store.hydrate_z_cache()
        chunks = chunk_frames_nivc(list(frames), self.rc)
        steps: List[NivcStep] = []
        for chunk in chunks:
            pc = chunk[0].pc
            if pc == 0 and len(chunk) < self.rc:
                # pad short pc=0 chunks to rc: the step function stutters
                # on Terminal/Error AND on pending Cproc expressions
                # (multiframe.rs:330-346, eval.rs stuttering condition)
                chunk = pad_frames(chunk, self.lurk_step, self.rc, store,
                                   self.lang)
            steps.append(NivcStep(pc, MultiFrame(
                chunk,
                io_scalars(store, chunk[0].input),
                io_scalars(store, chunk[-1].output))))
        # build shapes per circuit index actually used; the pc=0
        # (universal Lurk step) shape loads from the disk cache so
        # repeat proves are witness-only everywhere
        from .params_cache import load_shape, save_shape, shape_cache_key
        shapes: Dict[int, R1CSShape] = {}
        skey = None
        if not self.check_steps and not len(self.lang):
            skey = shape_cache_key(store.field.name, self.rc,
                                   self.lurk_step) + "-nivc"
            cached = load_shape(skey, store.field)
            if cached is not None:
                shapes[0] = cached
                skey = None
        instances: List[Tuple[int, List[int], List[int]]] = []
        synths = self.lang.circuit_synthesizers()
        for step in steps:
            func = self._step_func(step.pc)
            # full synthesis only for the first occurrence of each
            # circuit index (shape); later steps run witness-only
            wo = step.pc in shapes and not self.check_steps
            x, w, cs = step.mframe.instance(
                func, store, shape_check=self.check_steps,
                cproc_synthesizers=synths, witness_only=wo)
            if step.pc not in shapes:
                shapes[step.pc] = R1CSShape(cs)
                if step.pc == 0 and skey is not None:
                    save_shape(skey, shapes[0])
            elif not wo:
                assert shapes[step.pc].digest == cs.shape_digest(), \
                    f"non-uniform circuit for pc={step.pc}"
            instances.append((step.pc, x, w))
        pp = SuperNovaPublicParams.setup(shapes)
        # fold: one running accumulator per circuit index
        acc_inst: Dict[int, RelaxedInstance] = {
            pc: RelaxedInstance.default(s) for pc, s in shapes.items()}
        acc_wit: Dict[int, RelaxedWitness] = {
            pc: RelaxedWitness.default(s) for pc, s in shapes.items()}
        proof_steps = []
        for pc, x, w in instances:
            shape = shapes[pc]
            if self.check_steps:
                assert check_strict(shape, x, w)
            comm_w = pp.ck.commit(w)
            inst = R1CSInstance(comm_w, list(x))
            t = cross_term(shape, acc_inst[pc], acc_wit[pc], x, w)
            comm_t = pp.ck.commit(t)
            r = fold_challenge(pp.curve, shape.digest, acc_inst[pc], inst,
                               comm_t)
            acc_inst[pc] = fold_instance(pp.curve, acc_inst[pc], inst,
                                         comm_t, r, shape.p)
            acc_wit[pc] = fold_witness(shape.p, acc_wit[pc], w, t, r)
            proof_steps.append((pc, inst, comm_t))
        proof = NivcProof(
            steps=proof_steps,
            final_witnesses=acc_wit,
            z0=io_scalars(store, steps[0].mframe.frames[0].input),
            zi=io_scalars(store, steps[-1].mframe.frames[-1].output),
        )
        return pp, proof

    def evaluate_and_prove(self, store: Store, expr, limit: int = 10000):
        from ..lem.evaluation import evaluate
        frames = evaluate(self.setup(), expr, store, limit)
        pp, proof = self.prove_from_frames(store, frames)
        return pp, proof, frames


def _io_chain_ok(steps, z0, zi) -> bool:
    """The step IO linkage across ALL steps in order (z_out == next
    z_in) plus the z0/zi endpoints."""
    xs = [inst.x for _, inst, _ in steps]
    if not xs or xs[0][:6] != list(z0):
        return False
    for prev, cur in zip(xs, xs[1:]):
        if prev[6:] != cur[:6]:
            return False
    return xs[-1][6:] == list(zi)


def _fold_chains(pp: SuperNovaPublicParams, steps
                 ) -> Optional[Dict[int, RelaxedInstance]]:
    """Recompute the per-circuit fold chains; None on malformed IO."""
    acc: Dict[int, RelaxedInstance] = {
        pc: RelaxedInstance.default(s) for pc, s in pp.shapes.items()}
    for pc, inst, comm_t in steps:
        shape = pp.shapes.get(pc)
        if shape is None or len(inst.x) != shape.num_inputs - 1:
            return None
        r = fold_challenge(pp.curve, shape.digest, acc[pc], inst, comm_t)
        acc[pc] = fold_instance(pp.curve, acc[pc], inst, comm_t, r,
                                shape.p)
    return acc


def verify(pp: SuperNovaPublicParams, proof: NivcProof) -> bool:
    """Recompute the per-circuit fold chains + IO linkage, then check all
    final relaxed witnesses and commitment consistency."""
    if not _io_chain_ok(proof.steps, proof.z0, proof.zi):
        return False
    acc = _fold_chains(pp, proof.steps)
    if acc is None:
        return False
    for pc, shape in pp.shapes.items():
        wit = proof.final_witnesses[pc]
        if not check_relaxed(shape, acc[pc], wit):
            return False
        if pp.ck.commit(wit.w) != acc[pc].comm_w:
            return False
        if pp.ck.commit(wit.e) != acc[pc].comm_e:
            return False
    return True


# ---------------------------------------------------------------------------
# Compression (CompressedSNARK over every per-circuit accumulator)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CompressedNivcProof:
    """Fold chain + one Spartan proof per circuit index. The reference
    batches the per-circuit Spartan instances into one
    BatchedRelaxedR1CSSNARK (supernova.rs:163-198); per-circuit proofs
    are functionally equivalent (documented deviation: proof is
    #circuits x larger, verification identical)."""

    steps: List[Tuple[int, R1CSInstance, object]]
    spartans: Dict[int, object]     # pc -> spartan.SpartanProof
    z0: List[int]
    zi: List[int]


def compress(pp: SuperNovaPublicParams,
             proof: NivcProof) -> CompressedNivcProof:
    from . import spartan
    assert proof.steps, "cannot compress an empty NIVC fold chain"
    acc = _fold_chains(pp, proof.steps)
    assert acc is not None
    # circuits never folded keep the default accumulator, which has no
    # commitments to open; only prove circuits that appeared
    used = {pc for pc, _, _ in proof.steps}
    spartans = {
        pc: spartan.prove(pp.params_for(pc), acc[pc],
                          proof.final_witnesses[pc])
        for pc in sorted(used)
    }
    return CompressedNivcProof(proof.steps, spartans, proof.z0, proof.zi)


def verify_compressed(pp: SuperNovaPublicParams,
                      proof: CompressedNivcProof) -> bool:
    from . import spartan
    if not proof.steps:
        return False
    if not _io_chain_ok(proof.steps, proof.z0, proof.zi):
        return False
    acc = _fold_chains(pp, proof.steps)
    if acc is None:
        return False
    used = {pc for pc, _, _ in proof.steps}
    if set(proof.spartans) != used:
        return False
    for pc in used:
        if not spartan.verify(pp.params_for(pc), acc[pc],
                              proof.spartans[pc]):
            return False
    return True
