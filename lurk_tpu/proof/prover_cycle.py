"""Nova IVC prover (augmented circuits) over the universal Lurk step.

The cycle analogue of proof/prover.py: evaluate -> MultiFrames -> each
chunk becomes the step function of one primary augmented-circuit
synthesis -> dual-chain folding (proof/nova_cycle.py). This is the
reference's actual `nova` backend shape (RecursiveSNARK over the
augmented MultiFrame StepCircuit, /root/reference/src/proof/nova.rs:
260-373): O(1) proofs, optionally Spartan/IPA-compressed.
"""

from __future__ import annotations

from ..utils.tracing import instrument as _trace_instrument

import dataclasses
from typing import Dict, List, Optional, Tuple

from ..lem import evaluation as ev
from ..lem import ir
from ..lem.eval_step import eval_step
from ..lem.interpreter import Frame
from ..store.core import Ptr, Store
from . import spartan
from .multiframe import MultiFrame, io_scalars
from .nova import (
    PublicParams, R1CSInstance, RelaxedInstance, RelaxedWitness,
    fold_instance,
)
from .nova_cycle import (
    CycleProof, CyclePublicParams, CycleSNARK, cycle_fold_challenge,
    cycle_state_hash, verify as cycle_verify,
)


def multiframe_step_fn(lurk_step: ir.Func,
                       cproc_synthesizers: Optional[Dict] = None):
    """Step callback for the primary augmented circuit: rc chained Lurk
    frame syntheses (multiframe.rs:596-712 functionality), inputs/outputs
    as the 6-scalar z vector. The STORE travels in step_aux so cached
    public params stay valid across stores (shapes are store-free)."""
    from ..lem.circuit import AllocatedPtr, synthesize_frame_with_inputs

    def step(cs, zi, aux):
        frames, store = aux
        current = [AllocatedPtr(zi[2 * i], zi[2 * i + 1])
                   for i in range(3)]
        for frame in frames:
            current = synthesize_frame_with_inputs(
                cs, lurk_step, store, frame, current, cproc_synthesizers)
        out = []
        for ptr in current:
            out.extend((ptr.tag, ptr.hash))
        return out

    return step


_CYCLE_PP_CACHE: Dict[tuple, CyclePublicParams] = {}


def cycle_public_params(store: Store, rc: int, lurk_step: ir.Func,
                        lang: Optional[ev.Lang] = None
                        ) -> CyclePublicParams:
    """Cached CyclePublicParams for (field, rc, lang). Shape synthesis
    uses a nil evaluation padded to rc (uniform-shape property, pinned
    by tests)."""
    lang_key = (tuple(sorted(str(s) for s, _ in lang.cproc_specs()))
                if lang is not None and len(lang) else ())
    key = (store.field.name, rc, lang_key)
    pp = _CYCLE_PP_CACHE.get(key)
    if pp is not None:
        return pp
    synths = lang.circuit_synthesizers() if lang is not None else None
    step_fn = multiframe_step_fn(lurk_step, synths)
    nil = store.intern_nil()
    frames = ev.evaluate(None, nil, store, rc)
    store.hydrate_z_cache()
    mfs = MultiFrame.from_frames(frames, rc, lurk_step, store, lang)
    dummy_z0 = mfs[0].z_in
    from .params_cache import shape_cache_key
    import hashlib as _hl
    base = shape_cache_key(store.field.name, rc, lurk_step) + \
        _hl.sha256(repr(lang_key).encode()).hexdigest()[:8]
    pp = CyclePublicParams.setup(store.field, 6, step_fn, dummy_z0,
                                 (mfs[0].frames, store),
                                 cache_base=base)
    _CYCLE_PP_CACHE[key] = pp
    return pp


@dataclasses.dataclass
class CycleNovaProver:
    """IVC prover: one augmented fold step per rc-frame chunk."""

    rc: int = 10
    lang: Optional[ev.Lang] = None
    check_steps: bool = False

    def step_func(self) -> ir.Func:
        if self.lang is not None and len(self.lang):
            from ..lem.eval_step import make_eval_step
            return make_eval_step(tuple(self.lang.cproc_specs()), True)
        return eval_step()

    def evaluate_and_prove(self, store: Store, expr: Ptr,
                           limit: int = 10000
                           ) -> Tuple[CyclePublicParams, CycleProof,
                                      List[Frame]]:
        lang_setup = None
        if self.lang is not None and len(self.lang):
            lang_setup = ev.LangSetup.ivc(self.lang)
        frames = ev.evaluate(lang_setup, expr, store, limit)
        pp, proof = self.prove_from_frames(store, frames)
        return pp, proof, frames

    @_trace_instrument("nova_cycle.prove_from_frames")
    def prove_from_frames(self, store: Store, frames: List[Frame],
                          init: Optional[CycleSNARK] = None
                          ) -> Tuple[CyclePublicParams, CycleProof]:
        pp, snark = self.prove_incremental(store, frames, init)
        return pp, snark.finish()

    def prove_incremental(self, store: Store, frames: List[Frame],
                          init: Optional[CycleSNARK] = None
                          ) -> Tuple[CyclePublicParams, CycleSNARK]:
        """Fold `frames` into a (possibly pre-existing) running
        RecursiveSNARK and return it live, so a caller can keep folding
        later frames into the same accumulator (the reference's
        resumable-prove `init: Option<BaseRecursiveSNARK>`,
        proof/mod.rs:185-187; chain-server carries it across RPCs,
        chain-server/src/server.rs:445-548). `snark.finish()` is
        non-destructive: callers may emit a proof per increment."""
        assert frames
        store.hydrate_z_cache()
        step = self.step_func()
        mframes = MultiFrame.from_frames(frames, self.rc, step, store,
                                         self.lang)
        pp = cycle_public_params(store, self.rc, step, self.lang)
        if init is None:
            snark = CycleSNARK(pp, mframes[0].z_in)
        else:
            snark = init
            assert snark.pp is pp or \
                snark.pp.pp_digest == pp.pp_digest, \
                "resumed snark belongs to different public params"
            assert list(snark.zi) == [v % pp.field1.modulus
                                      for v in mframes[0].z_in], \
                "resumed snark state does not chain into these frames"
        caches = self._step_witness_caches(pp, mframes, store)
        for mf, cache in zip(mframes, caches):
            snark.prove_step(mf.z_out, step_aux=(mf.frames, store),
                             check=self.check_steps, step_cache=cache)
        return pp, snark

    def _step_witness_caches(self, pp, mframes, store):
        """Witness-gen ∥ folding (reference src/proof/nova.rs:297-332):
        each step's step-circuit witness segment depends only on
        (z_in, frames), not on the fold accumulators, so a fork pool
        computes all segments while the main process folds. Yields one
        (aux_segment, z_next_values) per MultiFrame (or None each when
        parallelism is off/unavailable)."""
        from ..config import settings
        if (self.check_steps or len(mframes) < 3
                or not settings().perf.parallel_witness_gen):
            for _ in mframes:
                yield None
            return
        import multiprocessing as mp
        try:
            ctx = mp.get_context("fork")
        except ValueError:
            for _ in mframes:
                yield None
            return
        global _STEP_WITNESS_ARGS
        # workers inherit everything via fork (copy-on-write): jobs are
        # bare indices and results are byte-packed aux segments — bigint
        # / frame-graph pickling was 10x the actual witness time.
        _STEP_WITNESS_ARGS = (pp.cfg1.step_fn, pp.field1, store, mframes)
        n_proc = min(len(mframes), max(1, (ctx.cpu_count() or 2) - 1))
        with ctx.Pool(n_proc) as pool:
            for packed, outs in pool.imap(_step_witness_worker,
                                          range(len(mframes))):
                yield (_unpack_aux(packed), outs)

    @staticmethod
    def verify(pp: CyclePublicParams, proof: CycleProof) -> bool:
        return cycle_verify(pp, proof)


_STEP_WITNESS_ARGS: Optional[tuple] = None


def _pack_aux(values) -> bytes:
    from ..native.fastpack import pack_ints
    return pack_ints(values)


def _unpack_aux(packed: bytes):
    from ..native.fastpack import unpack_ints
    return unpack_ints(packed)


def _step_witness_worker(k: int):
    step_fn, field, store, mframes = _STEP_WITNESS_ARGS
    mf = mframes[k]
    from ..r1cs.cs import ConstraintSystem
    from ..r1cs.gadgets import alloc_num
    cs = ConstraintSystem(field, witness_only=True)
    zi = [alloc_num(cs, v) for v in mf.z_in]
    n0 = len(cs.aux)
    outs = step_fn(cs, zi, (mf.frames, store))
    return _pack_aux(cs.aux[n0:]), [o.value for o in outs]


# ---------------------------------------------------------------------------
# Compression: Spartan/IPA over both final accumulators -> O(log) proof
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CompressedCycleProof:
    n: int
    z0: List[int]
    zn: List[int]
    u1: RelaxedInstance
    u2: RelaxedInstance
    u2_pending: R1CSInstance
    comm_t_last: object
    spartan1: spartan.SpartanProof
    spartan2: spartan.SpartanProof


def _side_pp(pp: CyclePublicParams, which: int) -> PublicParams:
    if which == 1:
        return PublicParams(pp.shape1, pp.curve1, pp.ck1)
    return PublicParams(pp.shape2, pp.curve2, pp.ck2)


def compress_cycle(pp: CyclePublicParams, proof: CycleProof
                   ) -> CompressedCycleProof:
    from concurrent.futures import ThreadPoolExecutor

    def _secondary():
        # independent proof (own transcript); overlaps the primary's
        # KZG MSMs on otherwise-idle cores (native calls drop the GIL)
        r2 = cycle_fold_challenge(pp.curve2, pp.pp_digest, proof.u2,
                                  proof.u2_pending, proof.comm_t_last)
        u2f = fold_instance(pp.curve2, proof.u2, proof.u2_pending,
                            proof.comm_t_last, r2, pp.field2.modulus)
        return spartan.prove(_side_pp(pp, 2), u2f, proof.w2_folded)

    with ThreadPoolExecutor(max_workers=1) as ex:
        fut2 = ex.submit(_secondary)
        sp1 = spartan.prove(_side_pp(pp, 1), proof.u1, proof.w1)
        sp2 = fut2.result()
    return CompressedCycleProof(proof.n, list(proof.z0), list(proof.zn),
                                proof.u1, proof.u2, proof.u2_pending,
                                proof.comm_t_last, sp1, sp2)


def verify_compressed_cycle(pp: CyclePublicParams,
                            cp: CompressedCycleProof) -> bool:
    if cp.n <= 0:
        return False
    if len(cp.u2_pending.x) != 2 or len(cp.u1.x) != 2 or \
            len(cp.u2.x) != 2:
        return False
    if len(cp.z0) != pp.io_arity or len(cp.zn) != pp.io_arity:
        return False
    h_n = cycle_state_hash(pp.curve2, pp.pp_digest, cp.n, cp.z0, cp.zn,
                           cp.u2, cp.u2_pending.x[0])
    g_n = cycle_state_hash(pp.curve1, pp.pp_digest, cp.n, [], [],
                           cp.u1, h_n)
    if cp.u2_pending.x[1] != g_n:
        return False
    r2 = cycle_fold_challenge(pp.curve2, pp.pp_digest, cp.u2,
                              cp.u2_pending, cp.comm_t_last)
    u2f = fold_instance(pp.curve2, cp.u2, cp.u2_pending, cp.comm_t_last,
                        r2, pp.field2.modulus)
    if not spartan.verify(_side_pp(pp, 1), cp.u1, cp.spartan1):
        return False
    if not spartan.verify(_side_pp(pp, 2), u2f, cp.spartan2):
        return False
    return True
