"""Throughput table across rc values — parity with the reference's
examples/tp_table.rs:40-147 (raw and adjusted frames/s per fold count).

Usage: python3 examples/tp_table.py [--rcs 10,20] [--folds 2,4] [--reps 2]
"""

from __future__ import annotations

import argparse
import statistics
import time

from fib import FIB_PROGRAM


def n_iters(n_folds: int, rc: int) -> int:
    return (n_folds + 1) * rc


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rcs", default="10,20")
    ap.add_argument("--folds", default="1,2")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--field", default="bn256")
    args = ap.parse_args()
    rcs = [int(v) for v in args.rcs.split(",")]
    folds = [int(v) for v in args.folds.split(",")]

    from lurk_tpu.fields import FIELDS
    from lurk_tpu.lem import evaluation as ev
    from lurk_tpu.parser import read_with_default_state
    from lurk_tpu.proof.prover import NovaProver
    from lurk_tpu.store.core import Store

    rows_raw = []
    rows_adj = []
    for rc in rcs:
        raw_line = [str(rc)]
        adj_line = [str(rc)]
        for nf in folds:
            limit = n_iters(nf, rc)
            tps = []
            tps_adj = []
            for _ in range(args.reps):
                store = Store(FIELDS[args.field])
                expr = read_with_default_state(store, FIB_PROGRAM)
                frames = ev.evaluate(None, expr, store, limit)
                prover = NovaProver(rc=rc)
                t0 = time.time()
                prover.prove_from_frames(store, frames)
                dt = time.time() - t0
                tps.append(len(frames) / dt)
                # adjusted: discount the mandatory first step (tp_table
                # "adjusted" metric: throughput of the marginal folds)
                tps_adj.append(max(len(frames) - rc, 1) / dt)
            mean = statistics.mean(tps)
            sd = statistics.stdev(tps) if len(tps) > 1 else 0.0
            raw_line.append(f"{mean:.2f}±{sd:.2f}")
            mean_a = statistics.mean(tps_adj)
            sd_a = statistics.stdev(tps_adj) if len(tps_adj) > 1 else 0.0
            adj_line.append(f"{mean_a:.2f}±{sd_a:.2f}")
        rows_raw.append(raw_line)
        rows_adj.append(adj_line)

    header = ["rc\\folds"] + [str(nf) for nf in folds]
    for title, rows in (("raw frames/s", rows_raw),
                        ("adjusted frames/s", rows_adj)):
        print(f"\n== {title} ==")
        print("  ".join(f"{h:>12}" for h in header))
        for row in rows:
            print("  ".join(f"{v:>12}" for v in row))


if __name__ == "__main__":
    main()
