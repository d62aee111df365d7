"""Foil: Flat Optimization Intermediate Language (experimental).

Parity target: /root/reference/foil/ — an e-graph-like congruence-closure
graph used to minimize flat programs before circuit synthesis (not wired
into the reference's prover pipeline either; foil/src/lib.rs:1-40).

A `Foil` holds vertices labeled by a head (operator or variable) with
ordered successor edges. `minimize` runs congruence closure: vertices
asserted equal are merged, and vertices with equal heads and congruent
successors are merged until fixpoint — yielding the minimal DAG.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Hashable, List, Optional, Tuple


@dataclasses.dataclass
class Vert:
    head: Hashable
    successors: List[int]


class Foil:
    def __init__(self):
        self.verts: List[Vert] = []
        self.parent: List[int] = []
        self.pending_equalities: List[Tuple[int, int]] = []

    # -- construction ------------------------------------------------------

    def add(self, head: Hashable, successors: Optional[List[int]] = None
            ) -> int:
        idx = len(self.verts)
        self.verts.append(Vert(head, list(successors or [])))
        self.parent.append(idx)
        return idx

    def assert_eq(self, a: int, b: int) -> None:
        self.pending_equalities.append((a, b))

    # -- union-find --------------------------------------------------------

    def find(self, x: int) -> int:
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: int, b: int) -> bool:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        # keep the lower index as representative (determinism)
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra
        return True

    # -- congruence closure ---------------------------------------------------

    def minimize(self) -> None:
        """Merge asserted equalities, then merge congruent vertices
        (same head, pairwise-equal successor classes) to fixpoint."""
        for a, b in self.pending_equalities:
            self.union(a, b)
        self.pending_equalities = []
        changed = True
        while changed:
            changed = False
            sig: Dict[Tuple, int] = {}
            for i, v in enumerate(self.verts):
                key = (v.head, tuple(self.find(s) for s in v.successors))
                j = sig.get(key)
                if j is None:
                    sig[key] = i
                elif self.union(i, j):
                    changed = True

    # -- views ------------------------------------------------------------------

    def classes(self) -> Dict[int, List[int]]:
        out: Dict[int, List[int]] = {}
        for i in range(len(self.verts)):
            out.setdefault(self.find(i), []).append(i)
        return out

    def canonical_graph(self) -> Dict[int, Tuple[Hashable, Tuple[int, ...]]]:
        """Minimized DAG: representative -> (head, successor reps)."""
        out = {}
        for rep, members in self.classes().items():
            v = self.verts[members[0]]
            out[rep] = (v.head,
                        tuple(self.find(s) for s in v.successors))
        return out
