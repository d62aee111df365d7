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


# ---------------------------------------------------------------------------
# Coil: Lurk-as-CAS on top of the congruence core
# (functionality parity: /root/reference/foil/src/coil.rs:56-575 +
# constructors.rs "deduce constructor" — Lurk source walks into a Foil
# graph; `bind` forms assert equivalences; projections (car/cdr) deduce
# their defining constructors during finalization; minimization yields
# the canonical DAG; a circuit synthesizes one allocation per class
# with constructor hash relations.)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CoilDef:
    """Schema: constructor symbols with their ordered projectors, and
    equivalence heads (lib.rs Schema; coil.rs CoilDef::new_std registers
    `.coil.bind` as the standard equivalence)."""

    constructors: Dict[str, List[str]] = dataclasses.field(
        default_factory=dict)
    equivalences: List[str] = dataclasses.field(
        default_factory=lambda: [".coil.bind"])

    @staticmethod
    def std() -> "CoilDef":
        d = CoilDef()
        d.constructors[".lurk.cons"] = [".lurk.car", ".lurk.cdr"]
        return d

    def projector_owner(self, head) -> Optional[Tuple[str, int]]:
        for ctor, projs in self.constructors.items():
            if head in projs:
                return ctor, projs.index(head)
        return None


class Coil:
    """Walks Lurk source (via the repo's parser/store) into a Foil
    graph. Variable labels are scope-deduped with a serial suffix
    (FoilConfig.dedup_var_names) so shadowed names stay distinct."""

    def __init__(self, defn: Optional[CoilDef] = None):
        self.defn = defn or CoilDef.std()
        self.foil = Foil()
        self._var_count = 0
        self._binds: List[int] = []

    # -- graph construction from Lurk source ------------------------------

    def _var(self, scope: Dict[str, int], name: str,
             fresh: bool) -> int:
        if not fresh and name in scope:
            return scope[name]
        vid = self.foil.add(("var", name, self._var_count))
        self._var_count += 1
        scope[name] = vid
        return vid

    def add_program(self, store, ptr, scope: Optional[Dict] = None
                    ) -> int:
        """Interns one Lurk form; returns its vertex. Understands
        `(let ((x e)) body...)` (coil.rs Let syntax) and treats any
        other list as an application."""
        from .tags import ExprTag
        scope = {} if scope is None else scope
        if ptr.tag == ExprTag.Sym:
            name = str(store.fetch_symbol(ptr))
            return self._var(scope, name, fresh=False)
        if ptr.tag in (ExprTag.Num, ExprTag.U64, ExprTag.Char):
            return self.foil.add(("const", store.fetch_num(ptr)
                                  if ptr.tag == ExprTag.Num
                                  else store.atoms[ptr.idx]))
        if ptr.tag != ExprTag.Cons:
            raise ValueError(f"coil: unsupported form tag {ptr.tag}")
        elts, tail = store.fetch_list(ptr)
        assert tail is None, "coil: improper list"
        head = elts[0]
        head_name = (str(store.fetch_symbol(head))
                     if head.tag == ExprTag.Sym else None)
        if head_name == ".lurk.let":
            bindings, _ = store.fetch_list(elts[1])
            inner = dict(scope)
            for b in bindings:
                (var_ptr, expr_ptr), _ = store.fetch_list(b)
                val_vid = self.add_program(store, expr_ptr, inner)
                vname = str(store.fetch_symbol(var_ptr))
                var_vid = self._var(inner, vname, fresh=True)
                bind_vid = self.foil.add(
                    (".coil.bind",), [var_vid, val_vid])
                self._binds.append(bind_vid)
            last = None
            for form in elts[2:]:
                last = self.add_program(store, form, inner)
            assert last is not None, "coil: let with empty body"
            return last
        args = [self.add_program(store, e, scope) for e in elts[1:]]
        return self.foil.add((head_name,), args)

    # -- finalization ------------------------------------------------------

    def finalize(self) -> None:
        """Deduce defining constructors for projections
        (constructors.rs:169-341: car(x) implies x ~ cons(car(x),
        cdr(x))), apply bind equivalences, minimize."""
        f = self.foil
        # group existing projections by (owner vertex class, ctor)
        for i in range(len(f.verts)):
            v = f.verts[i]
            head = v.head[0] if isinstance(v.head, tuple) else v.head
            owner = self.defn.projector_owner(head)
            if owner is None:
                continue
            ctor, _ = owner
            projs = self.defn.constructors[ctor]
            target = v.successors[0]
            # ensure every sibling projection exists
            proj_vids = []
            for pj in projs:
                found = None
                for k in range(len(f.verts)):
                    kv = f.verts[k]
                    kh = (kv.head[0] if isinstance(kv.head, tuple)
                          else kv.head)
                    if kh == pj and kv.successors and \
                            f.find(kv.successors[0]) == f.find(target):
                        found = k
                        break
                if found is None:
                    found = f.add((pj,), [target])
                proj_vids.append(found)
            ctor_vid = f.add((ctor,), proj_vids)
            f.assert_eq(ctor_vid, target)
        for b in self._binds:
            a, c = f.verts[b].successors
            f.assert_eq(a, c)
        f.minimize()
        # constructor injectivity (constructors.rs simplification):
        # cons(a, b) ~ cons(c, d) implies a ~ c and b ~ d; iterate with
        # congruence to fixpoint
        changed = True
        while changed:
            changed = False
            for rep, members in f.classes().items():
                ctors = [m for m in members
                         if (f.verts[m].head[0]
                             if isinstance(f.verts[m].head, tuple)
                             else f.verts[m].head)
                         in self.defn.constructors]
                if len(ctors) < 2:
                    continue
                base = f.verts[ctors[0]].successors
                for other in ctors[1:]:
                    for sa, sb in zip(base, f.verts[other].successors):
                        if f.find(sa) != f.find(sb):
                            f.union(sa, sb)
                            changed = True
            if changed:
                f.minimize()

    # -- circuit synthesis -------------------------------------------------

    def synthesize(self, cs, values: Dict[int, int]):
        """One allocation per minimized class; constructor classes get
        a Poseidon hash constraint over their successor allocations
        (coil.rs synthesize: Relation per head). `values` maps class
        representatives to field values (the host valuation)."""
        from .poseidon.circuit import poseidon_circuit
        from .r1cs.gadgets import alloc_num, enforce_equal
        f = self.foil
        allocs: Dict[int, object] = {}
        graph = f.canonical_graph()
        for rep in sorted(graph):
            allocs[rep] = alloc_num(cs, values.get(rep, 0))
        for rep in sorted(graph):
            # any member with a constructor head contributes a relation
            for member in f.classes()[rep]:
                head = f.verts[member].head
                hname = head[0] if isinstance(head, tuple) else head
                if hname in self.defn.constructors:
                    succ = [f.find(s)
                            for s in f.verts[member].successors]
                    digest = poseidon_circuit(
                        cs, cs.field, [allocs[s] for s in succ])
                    enforce_equal(cs, digest, allocs[rep])
                    break
        return allocs

    def class_info(self) -> List[Tuple[int, List, Optional[List[int]]]]:
        """(rep, member labels, successor reps) per class — the
        reference's graph.class_info test surface."""
        out = []
        f = self.foil
        for rep in sorted(f.classes()):
            members = f.classes()[rep]
            labels = [f.verts[m].head for m in members]
            succs = None
            for m in members:
                if f.verts[m].successors:
                    succs = [f.find(s) for s in f.verts[m].successors]
                    break
            out.append((rep, labels, succs))
        return out
