"""Iteration-count planning table (reference examples/itcalc.rs).

For a program modeled as setup_iterations + loop_iterations * n, print
the TOTAL proved iterations (padded to a multiple of rc) per (n, rc)
combination — the tool for picking rc for a workload.

Usage: python3 examples/itcalc.py [setup] [loop]
"""

from __future__ import annotations

import sys
from dataclasses import dataclass


@dataclass(frozen=True)
class Prog:
    setup_iterations: int
    loop_iterations: int


def real_iterations(prog: Prog, n: int) -> int:
    return prog.setup_iterations + prog.loop_iterations * n


def ceiling(n: int, m: int) -> int:
    return n // m + (1 if n % m else 0)


def total_iterations(real: int, rc: int):
    if real < rc:
        return None                       # rc larger than the workload
    return ceiling(real, rc) * rc


def analyze(prog: Prog, ns, rcs):
    rows = []
    for n in ns:
        row = [n, ""]
        for rc in rcs:
            t = total_iterations(real_iterations(prog, n), rc)
            row.append("-" if t is None else t)
        rows.append(row)
    return rows


def main() -> None:
    setup = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    loop = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    prog = Prog(setup, loop)
    ns = [10, 20, 40, 60, 80, 100, 120, 200, 400, 600, 800, 1000]
    rcs = [100, 200, 300, 400, 500, 600, 700, 800, 900]
    header = ["n", ""] + [f"rc={rc}" for rc in rcs]
    rows = analyze(prog, ns, rcs)
    widths = [max(len(str(r[i])) for r in [header] + rows)
              for i in range(len(header))]
    for r in [header] + rows:
        print("  ".join(str(v).rjust(w) for v, w in zip(r, widths)))


if __name__ == "__main__":
    main()
