"""Reference bench-suite parity harness.

Mirrors the workloads of /root/reference/benches/{end2end,synthesis,
public_params,trie_nivc}.rs (fibonacci.rs is covered by examples/fib.py
and sha256 by examples/sha256_{ivc,nivc}.py): each workload times the
same stages the reference's criterion groups time and prints one JSON
line per measurement, so regressions are diffable across commits the
way the reference's bench CI diffs criterion JSON.

Usage: python examples/benches.py [end2end|synthesis|public-params|
trie-nivc|all] [--rc N]
"""

from __future__ import annotations

import argparse
import json
import time

from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.lem import evaluation as ev
from lurk_tpu.parser import read_with_default_state
from lurk_tpu.store.core import Store


def _emit(name: str, stage: str, seconds: float, **extra) -> None:
    rec = {"bench": name, "stage": stage,
           "seconds": round(seconds, 4)}
    rec.update(extra)
    print(json.dumps(rec), flush=True)


def _go_base(a: int, b: int) -> str:
    """benches/end2end.rs:29-47 program."""
    return f"""
(let ((foo (lambda (a b)
              (letrec ((aux (lambda (i a x)
                               (if (= i b)
                                     x
                                     (let ((x (+ x a))
                                            (a (+ a (* b 2))))
                                       (aux (+ i 1) a x))))))
                       (let ((x (+ (* a b) 4)))
                         (aux 0 a x))))))
  (foo {a} {b}))
"""


def bench_end2end(rc: int) -> None:
    """end2end.rs: store (read), eval, hydration, prove, compress,
    verify on the go_base program."""
    src = _go_base(10, 16)
    t0 = time.time()
    store = Store(BN256_SCALAR)
    expr = read_with_default_state(store, src)
    _emit("end2end", "store", time.time() - t0)
    t0 = time.time()
    frames = ev.evaluate(None, expr, store, 1_000_000)
    _emit("end2end", "eval", time.time() - t0, frames=len(frames))
    t0 = time.time()
    store.hydrate_z_cache()
    _emit("end2end", "hydration", time.time() - t0)
    from lurk_tpu.proof import prover_supernova_cycle as psc
    prover = psc.SuperNovaCycleProver(rc=rc)
    t0 = time.time()
    pp, proof = prover.prove_from_frames(store, frames)
    _emit("end2end", "prove", time.time() - t0, rc=rc)
    t0 = time.time()
    comp = psc.compress_sn_cycle(pp, proof)
    _emit("end2end", "compress", time.time() - t0)
    t0 = time.time()
    ok = psc.verify_compressed_sn_cycle(pp, comp)
    _emit("end2end", "verify", time.time() - t0, ok=ok)
    assert ok


def bench_synthesis(rc: int) -> None:
    """synthesis.rs: ONE MultiFrame witness synthesis at reduction
    count rc (WitnessCS analog = witness_only ConstraintSystem)."""
    from lurk_tpu.lem.eval_step import eval_step
    from lurk_tpu.proof.multiframe import MultiFrame
    store = Store(BN256_SCALAR)
    fib_n = max(1, rc // 3)
    src = ("(letrec ((next (lambda (a b n target) "
           "(if (eq n target) a (next b (+ a b) (+ 1 n) target)))) "
           f"(fib (next 0 1 0))) (fib {fib_n}))")
    expr = read_with_default_state(store, src)
    frames = ev.evaluate(None, expr, store, 1_000_000)
    store.hydrate_z_cache()
    step = eval_step()
    mf = MultiFrame.from_frames(frames, rc, step, store)[0]
    t0 = time.time()
    mf.instance(step, store, witness_only=True)
    _emit("synthesis", "witness", time.time() - t0, rc=rc,
          frames=len(mf.frames))


def bench_public_params(rc: int) -> None:
    """public_params.rs: supernova-cycle public parameter setup
    (cold = cache miss path, warm = disk cache hit)."""
    import shutil
    import tempfile
    import os
    from lurk_tpu.proof import prover_supernova_cycle as psc
    tmp = tempfile.mkdtemp(prefix="pp_bench_")
    old = os.environ.get("LURK_TPU_CACHE")
    os.environ["LURK_TPU_CACHE"] = tmp
    try:
        store = Store(BN256_SCALAR)
        prover = psc.SuperNovaCycleProver(rc=rc)
        lurk_step, cprocs = prover.setup_funcs()
        psc._PP_CACHE.clear()          # measure the disk path, not LRU
        t0 = time.time()
        psc.sn_cycle_public_params(store, rc, lurk_step, cprocs, None)
        _emit("public_params", "cold", time.time() - t0, rc=rc)
        psc._PP_CACHE.clear()
        t0 = time.time()
        psc.sn_cycle_public_params(store, rc, lurk_step, cprocs, None)
        _emit("public_params", "warm", time.time() - t0, rc=rc)
    finally:
        if old is None:
            os.environ.pop("LURK_TPU_CACHE", None)
        else:
            os.environ["LURK_TPU_CACHE"] = old
        shutil.rmtree(tmp, ignore_errors=True)


TRIE_CODE = """
(let ((fib (letrec ((next (lambda (a b n target)
               (if (eq n target)
                   a
                   (next b
                         (+ a b)
                         (+ 1 n)
                         target))))
            (fib (next 0 1 0)))
          fib))
      (fib-trie (.lurk.trie.new))
      (fib-trie (.lurk.trie.insert fib-trie 40 (fib 40)))
      (fib-trie (.lurk.trie.insert fib-trie 50 (fib 50))))
  (+ (num (.lurk.trie.lookup fib-trie 40)) (num (.lurk.trie.lookup fib-trie 50))))"""


def bench_trie_nivc(rc: int) -> None:
    """trie_nivc.rs: the trie-coprocessor NIVC program; asserts the
    reference's pinned result 12688603180, then proves at rc."""
    from lurk_tpu.coproc.trie import install_trie_lang
    from lurk_tpu.proof import prover_supernova_cycle as psc
    store = Store(BN256_SCALAR)
    lang, _new, _lookup, _insert = install_trie_lang()
    expr = read_with_default_state(store, TRIE_CODE)
    lang_setup = ev.LangSetup.nivc(lang)
    t0 = time.time()
    frames = ev.evaluate(lang_setup, expr, store, 1_000_000)
    _emit("trie_nivc", "eval", time.time() - t0, frames=len(frames))
    out = frames[-1].output[0]
    assert store.fetch_num(out) == 12688603180, \
        f"trie result {store.fetch_num(out)} != reference 12688603180"
    prover = psc.SuperNovaCycleProver(rc=rc, lang=lang)
    t0 = time.time()
    pp, proof = prover.prove_from_frames(store, frames)
    _emit("trie_nivc", "prove", time.time() - t0, rc=rc)
    assert psc.SuperNovaCycleProver.verify(pp, proof)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="?", default="all",
                    choices=["end2end", "synthesis", "public-params",
                             "trie-nivc", "all"])
    ap.add_argument("--rc", type=int, default=10)
    args = ap.parse_args()
    if args.which in ("end2end", "all"):
        bench_end2end(args.rc)
    if args.which in ("synthesis", "all"):
        bench_synthesis(args.rc)
    if args.which in ("public-params", "all"):
        bench_public_params(args.rc)
    if args.which in ("trie-nivc", "all"):
        bench_trie_nivc(args.rc)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
