"""SuperNova NIVC prover (augmented circuits) over the universal Lurk
step + coprocessor circuits: the O(#circuits) `supernova` backend.

The cycle analogue of proof/supernova.py (which keeps the recomputing
fold-chain verifier): evaluate -> pc-chunked MultiFrames -> each chunk
becomes one primary augmented synthesis for its circuit index ->
dual-chain folding (proof/supernova_cycle.py). Reference functionality:
/root/reference/src/proof/supernova.rs:200-318 via arecibo.
"""

from __future__ import annotations

from ..utils.tracing import instrument as _trace_instrument

import dataclasses
from typing import Dict, List, Optional, Tuple

from ..lem import evaluation as ev
from ..lem import ir
from ..lem.eval_step import eval_step, make_cprocs_funcs, make_eval_step
from ..lem.interpreter import Frame
from ..store.core import Ptr, Store
from .multiframe import MultiFrame, io_scalars, pad_frames
from .supernova import chunk_frames_nivc
from .supernova_cycle import (
    SnCyclePublicParams, SnCycleProof, SnCycleSNARK,
    verify as sn_cycle_verify,
)


def _chunk_step_fn(func: ir.Func,
                   cproc_synthesizers: Optional[Dict] = None):
    """Primary step callback: chain the chunk's frame syntheses; the
    next circuit index is allocated as advice (multiframe.rs:922-966:
    the reference's supernova StepCircuit also allocates next_pc). The
    STORE travels in step_aux so cached public params stay valid across
    stores."""
    from ..lem.circuit import AllocatedPtr, synthesize_frame_with_inputs
    from ..r1cs.gadgets import alloc_num

    def step(cs, zi, aux):
        frames, next_pc, store = aux
        current = [AllocatedPtr(zi[2 * i], zi[2 * i + 1])
                   for i in range(3)]
        for frame in frames:
            current = synthesize_frame_with_inputs(
                cs, func, store, frame, current, cproc_synthesizers)
        out = []
        for ptr in current:
            out.extend((ptr.tag, ptr.hash))
        return out, alloc_num(cs, next_pc)

    return step


_PP_CACHE: Dict[tuple, SnCyclePublicParams] = {}


def sn_cycle_public_params(store: Store, rc: int, lurk_step: ir.Func,
                           cprocs: List[ir.Func],
                           lang: Optional[ev.Lang] = None
                           ) -> SnCyclePublicParams:
    lang_key = (tuple(sorted(str(s) for s, _ in lang.cproc_specs()))
                if lang is not None and len(lang) else ())
    key = (store.field.name, rc, lang_key)
    pp = _PP_CACHE.get(key)
    if pp is not None:
        return pp
    synths = lang.circuit_synthesizers() if lang is not None else None
    step_fns = [_chunk_step_fn(lurk_step, synths)]
    for func in cprocs:
        step_fns.append(_chunk_step_fn(func, synths))
    # dummy auxes for shape synthesis
    nil = store.intern_nil()
    frames = ev.evaluate(None, nil, store, rc)
    frames = pad_frames(frames, lurk_step, rc, store, lang)
    store.hydrate_z_cache()
    dummy_auxes = [(frames, 0, store)]
    for func in cprocs:
        dummy_auxes.append(
            ([Frame.blank_frame(func, 0, store)], 0, store))
    dummy_z0 = io_scalars(store, frames[0].input)
    from .params_cache import shape_cache_key
    import hashlib as _hl
    base = shape_cache_key(store.field.name, rc, lurk_step) + \
        _hl.sha256(repr(lang_key).encode()).hexdigest()[:8]
    pp = SnCyclePublicParams.setup(store.field, 6, step_fns, dummy_z0,
                                   dummy_auxes, cache_base=base)
    _PP_CACHE[key] = pp
    return pp


@dataclasses.dataclass
class SuperNovaCycleProver:
    """NIVC prover: one augmented fold step per pc chunk."""

    rc: int = 10
    lang: Optional[ev.Lang] = None
    check_steps: bool = False

    def setup_funcs(self) -> Tuple[ir.Func, List[ir.Func]]:
        if self.lang is not None and len(self.lang):
            specs = tuple(self.lang.cproc_specs())
            return make_eval_step(specs, False), make_cprocs_funcs(specs)
        return make_eval_step((), False), []

    def evaluate_and_prove(self, store: Store, expr: Ptr,
                           limit: int = 10000):
        lang_setup = None
        if self.lang is not None and len(self.lang):
            lang_setup = ev.LangSetup.nivc(self.lang)
        frames = ev.evaluate(lang_setup, expr, store, limit)
        pp, proof = self.prove_from_frames(store, frames)
        return pp, proof, frames

    @_trace_instrument("supernova_cycle.prove_from_frames")
    def prove_from_frames(self, store: Store, frames: List[Frame]
                          ) -> Tuple[SnCyclePublicParams, SnCycleProof]:
        assert frames
        store.hydrate_z_cache()
        lurk_step, cprocs = self.setup_funcs()
        chunks = chunk_frames_nivc(list(frames), self.rc)
        padded: List[List[Frame]] = []
        for chunk in chunks:
            if chunk[0].pc == 0 and len(chunk) < self.rc:
                chunk = pad_frames(chunk, lurk_step, self.rc, store,
                                   self.lang)
            padded.append(chunk)
        pp = sn_cycle_public_params(store, self.rc, lurk_step, cprocs,
                                    self.lang)
        snark = SnCycleSNARK(pp, io_scalars(store, padded[0][0].input))
        caches = self._step_witness_caches(pp, padded, store)
        for (k, chunk), cache in zip(enumerate(padded), caches):
            pc = chunk[0].pc
            next_pc = padded[k + 1][0].pc if k + 1 < len(padded) else 0
            z_next = io_scalars(store, chunk[-1].output)
            snark.prove_step(pc, z_next, next_pc,
                             step_aux=(chunk, next_pc, store),
                             check=self.check_steps, step_cache=cache)
        return pp, snark.finish()

    def _step_witness_caches(self, pp, padded, store):
        """Witness-gen ∥ folding for NIVC (reference
        src/proof/supernova.rs:248-285): per-chunk step witnesses are
        accumulator-independent; a fork pool computes (aux segment,
        z_next, pc_next) triples while the main process folds."""
        from ..config import settings
        if (self.check_steps or len(padded) < 3
                or not settings().perf.parallel_witness_gen):
            for _ in padded:
                yield None
            return
        import multiprocessing as mp
        try:
            ctx = mp.get_context("fork")
        except ValueError:
            for _ in padded:
                yield None
            return
        global _SN_STEP_WITNESS_ARGS
        _SN_STEP_WITNESS_ARGS = (pp, store, padded)
        n_proc = min(len(padded), max(1, (ctx.cpu_count() or 2) - 1))
        from .prover_cycle import _unpack_aux
        with ctx.Pool(n_proc) as pool:
            for packed, outs, pc_next in pool.imap(
                    _sn_step_witness_worker, range(len(padded))):
                yield (_unpack_aux(packed), outs, pc_next)

    @staticmethod
    def verify(pp: SnCyclePublicParams, proof: SnCycleProof) -> bool:
        return sn_cycle_verify(pp, proof)


# ---------------------------------------------------------------------------
# Compression: Spartan/IPA over every final accumulator -> O(log) proof
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CompressedSnCycleProof:
    n: int
    z0: List[int]
    zn: List[int]
    pc_n: int
    u1s: List[object]             # RelaxedInstance per circuit
    u2: object
    u2_pending: object
    comm_t_last: object
    spartans1: List[object]       # SpartanProof per primary circuit
    spartan2: object


def _side_pp1(pp: SnCyclePublicParams, pc: int):
    from .nova import PublicParams
    return PublicParams(pp.shapes1[pc], pp.curve1, pp.ck1)


def _side_pp2(pp: SnCyclePublicParams):
    from .nova import PublicParams
    return PublicParams(pp.shape2, pp.curve2, pp.ck2)


def compress_sn_cycle(pp: SnCyclePublicParams, proof: SnCycleProof
                      ) -> CompressedSnCycleProof:
    from concurrent.futures import ThreadPoolExecutor

    from . import spartan
    from .nova import fold_instance
    from .nova_cycle import cycle_fold_challenge

    def _secondary():
        # independent proof (own transcript); the native sumcheck/IPA
        # calls release the GIL, so it overlaps the primary's
        # KZG MSMs on otherwise-idle cores
        r2 = cycle_fold_challenge(pp.curve2, pp.pp_digest, proof.u2,
                                  proof.u2_pending, proof.comm_t_last)
        u2f = fold_instance(pp.curve2, proof.u2, proof.u2_pending,
                            proof.comm_t_last, r2, pp.field2.modulus)
        return spartan.prove(_side_pp2(pp), u2f, proof.w2_folded)

    with ThreadPoolExecutor(max_workers=1) as ex:
        fut2 = ex.submit(_secondary)
        spartans1 = [spartan.prove(_side_pp1(pp, pc), proof.u1s[pc],
                                   proof.w1s[pc])
                     for pc in range(pp.n_circuits)]
        sp2 = fut2.result()
    return CompressedSnCycleProof(
        proof.n, list(proof.z0), list(proof.zn), proof.pc_n,
        list(proof.u1s), proof.u2, proof.u2_pending, proof.comm_t_last,
        spartans1, sp2)


def verify_compressed_sn_cycle(pp: SnCyclePublicParams,
                               cp: CompressedSnCycleProof) -> bool:
    from . import spartan
    from .nova import fold_instance
    from .nova_cycle import cycle_fold_challenge
    from .supernova_cycle import sn_state1, sn_state2
    if cp.n <= 0 or len(cp.u1s) != pp.n_circuits:
        return False
    if len(cp.z0) != pp.io_arity or len(cp.zn) != pp.io_arity:
        return False
    if len(cp.u2_pending.x) != 2 or len(cp.u2.x) != 2 or \
            any(len(u.x) != 2 for u in cp.u1s):
        return False
    h_n = sn_state1(pp.curve2, pp.pp_digest, cp.n, cp.z0, cp.zn,
                    cp.pc_n, cp.u2, cp.u2_pending.x[0])
    g_n = sn_state2(pp.curve1, pp.pp_digest, cp.n, cp.u1s, h_n)
    if cp.u2_pending.x[1] != g_n:
        return False
    r2 = cycle_fold_challenge(pp.curve2, pp.pp_digest, cp.u2,
                              cp.u2_pending, cp.comm_t_last)
    u2f = fold_instance(pp.curve2, cp.u2, cp.u2_pending, cp.comm_t_last,
                        r2, pp.field2.modulus)
    for pc in range(pp.n_circuits):
        if not spartan.verify(_side_pp1(pp, pc), cp.u1s[pc],
                              cp.spartans1[pc]):
            return False
    return spartan.verify(_side_pp2(pp), u2f, cp.spartan2)


_SN_STEP_WITNESS_ARGS = None


def _sn_step_witness_worker(k: int):
    pp, store, padded = _SN_STEP_WITNESS_ARGS
    chunk = padded[k]
    pc = chunk[0].pc
    next_pc = padded[k + 1][0].pc if k + 1 < len(padded) else 0
    from ..r1cs.cs import ConstraintSystem
    from ..r1cs.gadgets import alloc_num
    from .prover_cycle import _pack_aux
    cs = ConstraintSystem(pp.field1, witness_only=True)
    zi = [alloc_num(cs, v) for v in io_scalars(store, chunk[0].input)]
    n0 = len(cs.aux)
    z_next, pc_next = pp.cfg1s[pc].step_fn(cs, zi,
                                           (chunk, next_pc, store))
    return (_pack_aux(cs.aux[n0:]), [o.value for o in z_next],
            pc_next.value)
