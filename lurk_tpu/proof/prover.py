"""Top-level Nova prover: evaluate -> MultiFrames -> fold chain.

Parity: /root/reference/src/proof/mod.rs:131-245 (Prover::prove /
evaluate_and_prove / prove_from_frames) + nova.rs prove loop. The
reference pipelines witness generation against folding via a bounded
channel (nova.rs:297-332); here step witness synthesis happens inline —
the device-batched witness/MSM pipeline is the next optimization layer.
"""

from __future__ import annotations

from ..utils.tracing import instrument as _trace_instrument

import dataclasses
from typing import Dict, List, Optional, Tuple

from ..lem import evaluation as ev
from ..lem import ir
from ..lem.eval_step import eval_step
from ..lem.interpreter import Frame
from ..r1cs.cs import ConstraintSystem
from ..store.core import Ptr, Store
from .multiframe import MultiFrame, io_chain_checker, io_scalars
from .nova import (
    FoldingProof, PublicParams, R1CSShape, RecursiveSNARK, verify,
)

_PP_CACHE: Dict[Tuple[str, int], PublicParams] = {}


def public_params(shape: R1CSShape) -> PublicParams:
    key = (shape.digest, shape.num_aux)
    pp = _PP_CACHE.get(key)
    if pp is None:
        pp = PublicParams.setup(shape)
        _PP_CACHE[key] = pp
    return pp


@dataclasses.dataclass
class NovaProver:
    """IVC prover over the universal Lurk step circuit."""

    rc: int = 10
    lang: Optional[ev.Lang] = None
    check_steps: bool = False   # debug: verify each step witness

    def step_func(self) -> ir.Func:
        if self.lang is not None and len(self.lang):
            from ..lem.eval_step import make_eval_step
            return make_eval_step(tuple(self.lang.cproc_specs()), True)
        return eval_step()

    # -- proving ------------------------------------------------------------

    def evaluate_and_prove(self, store: Store, expr: Ptr, limit: int = 10000
                           ) -> Tuple[PublicParams, FoldingProof,
                                      List[Frame]]:
        lang_setup = None
        if self.lang is not None and len(self.lang):
            lang_setup = ev.LangSetup.ivc(self.lang)
        frames = ev.evaluate(lang_setup, expr, store, limit)
        pp, proof = self.prove_from_frames(store, frames)
        return pp, proof, frames

    @_trace_instrument("nova_fold.prove_from_frames")
    def prove_from_frames(self, store: Store, frames: List[Frame]
                          ) -> Tuple[PublicParams, FoldingProof]:
        assert frames
        store.hydrate_z_cache()
        step = self.step_func()
        mframes = MultiFrame.from_frames(frames, self.rc, step, store,
                                         self.lang)
        synths = (self.lang.circuit_synthesizers()
                  if self.lang is not None else None)
        # shape from the first step (uniform across steps; pinned by
        # tests), via the disk cache when possible so repeat proves run
        # witness-only everywhere (public_parameters/ DiskCache parity)
        from .params_cache import load_shape, save_shape, shape_cache_key
        shape = None
        skey = None
        if not self.check_steps and not synths:
            skey = shape_cache_key(store.field.name, self.rc, step)
            shape = load_shape(skey, store.field)
        first = [mframes[0]] if shape is not None else []
        if shape is None:
            x0, w0, cs0 = mframes[0].instance(
                step, store, shape_check=self.check_steps,
                cproc_synthesizers=synths)
            shape = R1CSShape(cs0)
            if skey is not None:
                save_shape(skey, shape)
        else:
            x0 = w0 = None
        pp = public_params(shape)
        rs = RecursiveSNARK(pp)
        rs.z0 = io_scalars(store, mframes[0].frames[0].input)
        if x0 is not None:
            rs.prove_step(x0, w0, check=self.check_steps)
        for x, w in self._witnesses(first + mframes[1:], step, store,
                                    synths):
            rs.prove_step(x, w, check=self.check_steps)
        rs.zi = io_scalars(store, mframes[-1].frames[-1].output)
        return pp, rs.finish()

    def _witnesses(self, mframes, step, store, synths):
        """Per-step witness synthesis. The witness-only fast path (no
        LC algebra) makes in-process generation ~30x faster than the old
        full synthesis, so the fork pool (the reference's rayon frames
        axis, config.rs:192-194) is now pure IPC overhead and only used
        for FULL synthesis runs (check_steps)."""
        from ..config import settings
        if (not settings().perf.parallel_witness_gen or len(mframes) < 2
                or synths or not self.check_steps):
            for mf in mframes:
                x, w, _ = mf.instance(step, store,
                                      shape_check=self.check_steps,
                                      cproc_synthesizers=synths,
                                      witness_only=not self.check_steps)
                yield x, w
            return
        import multiprocessing as mp
        try:
            ctx = mp.get_context("fork")
        except ValueError:
            for mf in mframes:
                x, w, _ = mf.instance(step, store,
                                      shape_check=self.check_steps,
                                      witness_only=not self.check_steps)
                yield x, w
            return
        global _WORKER_ARGS
        _WORKER_ARGS = (step, store)
        n_proc = min(len(mframes), max(1, (ctx.cpu_count() or 2) - 1))
        with ctx.Pool(n_proc) as pool:
            for x, w in pool.imap(_witness_worker, mframes):
                yield x, w

    # -- verification --------------------------------------------------------

    @staticmethod
    def verify(pp: PublicParams, proof: FoldingProof) -> bool:
        return verify(pp, proof,
                      io_chain_checker(proof.z0, proof.zi))


_WORKER_ARGS: Optional[tuple] = None


def _witness_worker(mf: MultiFrame):
    step, store = _WORKER_ARGS
    x, w, _ = mf.instance(step, store, witness_only=True)
    return x, w
