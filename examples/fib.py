"""Fibonacci proving benchmark — the reference's headline workload
(/root/reference/benches/{fibonacci.rs,common/fib.rs}): prove the
infinite-stream fib program for `n` iterations of the target frame
model frame(n) = 7 + 7n, limit rounded up to a multiple of rc.

Usage:
    python3 examples/fib.py [n] [rc] [--backend nova-fold|nova|supernova]

Reports Lurk frames/s (the reference bench's throughput unit).
"""

from __future__ import annotations

import argparse
import sys
import time

FIB_PROGRAM = """
(letrec ((next (lambda (a b) (next b (+ a b))))
         (fib (next 0 1)))
  (fib))
"""

LIN_COEF = 7
ANG_COEF = 7


def fib_frame(n: int) -> int:
    return LIN_COEF + ANG_COEF * n


def fib_limit(n: int, rc: int) -> int:
    frame = fib_frame(n)
    return rc * (frame // rc + (1 if frame % rc else 0))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int, nargs="?", default=100)
    ap.add_argument("rc", type=int, nargs="?", default=100)
    ap.add_argument("--backend", default="nova-fold",
                    choices=["nova-fold", "nova", "supernova"])
    ap.add_argument("--field", default="bn256")
    args = ap.parse_args()

    from lurk_tpu.fields import FIELDS
    from lurk_tpu.lem import evaluation as ev
    from lurk_tpu.parser import read_with_default_state
    from lurk_tpu.store.core import Store

    store = Store(FIELDS[args.field])
    expr = read_with_default_state(store, FIB_PROGRAM)
    limit = fib_limit(args.n, args.rc)
    t0 = time.time()
    frames = ev.evaluate(None, expr, store, limit)
    t_eval = time.time() - t0
    print(f"eval: {len(frames)} frames in {t_eval:.2f}s "
          f"({len(frames) / t_eval:.0f} frames/s)")

    t0 = time.time()
    if args.backend == "nova":
        from lurk_tpu.proof.prover_cycle import CycleNovaProver
        prover = CycleNovaProver(rc=args.rc)
        pp, proof = prover.prove_from_frames(store, frames)
        ok = CycleNovaProver.verify(pp, proof)
    elif args.backend == "supernova":
        from lurk_tpu.proof import supernova as sn
        from lurk_tpu.proof.supernova import SuperNovaProver
        from lurk_tpu.lem.evaluation import Lang
        prover = SuperNovaProver(rc=args.rc, lang=Lang())
        pp, proof = prover.prove_from_frames(store, frames)
        ok = sn.verify(pp, proof)
    else:
        from lurk_tpu.proof.prover import NovaProver
        prover = NovaProver(rc=args.rc)
        pp, proof = prover.prove_from_frames(store, frames)
        ok = NovaProver.verify(pp, proof)
    t_prove = time.time() - t0
    assert ok, "verification failed"
    print(f"prove+verify [{args.backend}, rc={args.rc}]: {t_prove:.1f}s "
          f"-> {len(frames) / t_prove:.2f} frames/s")


if __name__ == "__main__":
    sys.exit(main())
