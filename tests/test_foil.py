"""Foil congruence-closure minimization."""

from lurk_tpu.foil import Foil


def test_congruent_merge():
    f = Foil()
    a = f.add("a")
    b = f.add("b")
    plus1 = f.add("+", [a, b])
    plus2 = f.add("+", [a, b])
    f.minimize()
    assert f.find(plus1) == f.find(plus2)
    assert f.find(a) != f.find(b)


def test_equality_propagates_upward():
    f = Foil()
    a = f.add("a")
    b = f.add("b")
    fa = f.add("f", [a])
    fb = f.add("f", [b])
    ffa = f.add("f", [fa])
    ffb = f.add("f", [fb])
    f.assert_eq(a, b)
    f.minimize()
    assert f.find(fa) == f.find(fb)
    assert f.find(ffa) == f.find(ffb)
    assert len(f.canonical_graph()) == 3  # {a=b}, {fa=fb}, {ffa=ffb}


def test_no_false_merges():
    f = Foil()
    a = f.add("a")
    g1 = f.add("g", [a])
    h1 = f.add("h", [a])
    f.minimize()
    assert f.find(g1) != f.find(h1)


def test_coil_program_graph_and_minimize():
    """coil.rs:603-717 test_coil_foil functionality: the nested-let
    program interns into the expected class structure; finalize deduces
    defining constructors for projections, applies binds, and the
    minimized graph identifies car(x) with the constructor argument."""
    from lurk_tpu.fields import BN256_SCALAR
    from lurk_tpu.foil import Coil
    from lurk_tpu.parser import read_with_default_state
    from lurk_tpu.store.core import Store

    store = Store(BN256_SCALAR, use_device=False)
    src = """(let ((x (cons q r)))
               (let ((s (let ((x (cons a b)))
                          (car x)
                          (xxx qqq))))
                 (car x)))"""
    expr = read_with_default_state(store, src)
    coil = Coil()
    coil.add_program(store, expr)
    f = coil.foil
    # pre-finalize: 16 vertices, all singleton classes (coil.rs:656-676)
    assert len(f.verts) == 16
    assert len(f.classes()) == 16
    coil.finalize()
    g = coil.canonical = f.canonical_graph()
    cls = f.classes()

    def rep_of(pred):
        for i, v in enumerate(f.verts):
            h = v.head[0] if isinstance(v.head, tuple) else v.head
            if pred(h, v):
                return f.find(i)
        raise AssertionError("vertex not found")

    # outer x merged with its defining cons(q, r)
    outer_x = rep_of(lambda h, v: h == "var" and v.head[1].endswith(".x")
                     and v.head[2] == 2)
    outer_cons = rep_of(lambda h, v: h == ".lurk.cons"
                        and len(v.successors) == 2
                        and f.find(v.successors[0]) == f.find(0))
    assert outer_x == outer_cons
    # car(outer x) merged with q (projection of the deduced constructor)
    q = f.find(0)
    car_outer = [i for i, v in enumerate(f.verts)
                 if (v.head[0] if isinstance(v.head, tuple) else v.head)
                 == ".lurk.car" and f.find(v.successors[0]) == outer_x]
    assert car_outer and all(f.find(i) == q for i in car_outer)
    # inner x likewise merged with cons(a, b), car(inner x) with a
    # (shadowed x stayed distinct from outer x)
    inner_x_vid = [i for i, v in enumerate(f.verts)
                   if isinstance(v.head, tuple) and v.head[0] == "var"
                   and v.head[1].endswith(".x") and v.head[2] != 2]
    assert inner_x_vid and f.find(inner_x_vid[0]) != outer_x


def test_coil_circuit_synthesis():
    """Minimized-graph circuit: one allocation per class, constructor
    classes carry a Poseidon relation (coil.rs synthesize)."""
    from lurk_tpu.fields import BN256_SCALAR
    from lurk_tpu.foil import Coil
    from lurk_tpu.parser import read_with_default_state
    from lurk_tpu.poseidon.host import hash_preimage
    from lurk_tpu.r1cs.cs import ConstraintSystem
    from lurk_tpu.store.core import Store

    store = Store(BN256_SCALAR, use_device=False)
    expr = read_with_default_state(
        store, "(let ((x (cons q r))) (car x))")
    coil = Coil()
    coil.add_program(store, expr)
    coil.finalize()
    f = coil.foil
    graph = f.canonical_graph()
    # host valuation: q = 7, r = 9, cons class = hash2(q, r)
    q_rep, r_rep = f.find(0), f.find(1)
    cons_rep = None
    for rep, (head, succ) in graph.items():
        h = head[0] if isinstance(head, tuple) else head
        if h in (".lurk.cons", "var") and succ and len(succ) == 2:
            cons_rep = rep
    values = {q_rep: 7, r_rep: 9}
    digest = hash_preimage(BN256_SCALAR, [7, 9])
    for rep, (head, succ) in graph.items():
        if rep not in values:
            values[rep] = digest if succ and len(succ) == 2 else 0
    # fix projection classes: car(x) ~ q already merged into q_rep
    cs = ConstraintSystem(BN256_SCALAR, check=True)
    coil.synthesize(cs, values)
    assert cs.is_satisfied()
    # wrong valuation must violate the constructor relation
    bad = dict(values)
    bad[q_rep] = 8
    cs2 = ConstraintSystem(BN256_SCALAR)
    coil.synthesize(cs2, bad)
    assert not cs2.is_satisfied()


def test_schema_typed_metadata_and_general_synthesis():
    """The Schema/typed-metadata layer + general Relation synthesis
    (foil/src/lib.rs Schema/Func/MetaMapper, circuit.rs MappedFoil —
    completed here: real witnesses, satisfaction-checked)."""
    from lurk_tpu.fields import BN256_SCALAR
    from lurk_tpu.foil import (
        Foil, Func, MappedFoil, MetaMapper, Relation, Schema,
    )
    from lurk_tpu.r1cs.cs import ConstraintSystem, lc_add

    class SumRelation(Relation):
        def synthesize(self, cs, allocated_head, successors):
            lc = {}
            for s in successors:
                lc = lc_add(lc, s.lc, cs.p)
            cs.enforce(lc, {ConstraintSystem.ONE_VAR: 1},
                       allocated_head.lc)

    pair = Func.constructor(
        "pair", [Func("fst", metadata=("proj", "pair", 0)),
                 Func("snd", metadata=("proj", "pair", 1))],
        metadata=("sum", 2))
    schema = Schema(equivalences=[Func("bind")])
    schema.add_constructor(pair)
    assert schema.constructor_for_projector("snd")[1] == 1

    f = Foil(schema)
    a = f.add(("var", "a"))
    b = f.add(("var", "b"))
    # only one projection exists in the source; deduction must invent
    # the sibling and the defining constructor
    x = f.add(("var", "x"))
    f.add(("fst",), [x], meta=("proj", "pair", 0))
    # bind x to pair-of(a, b) indirectly via an equivalence vertex
    p = f.add(("pair",), [a, b], meta=("sum", 2))
    f.add(("bind",), [x, p])
    f.finalize()
    # x merged with pair(a, b); fst(x) exists; snd(x) deduced
    assert f.find(x) == f.find(p)
    snd_vids = [i for i, v in enumerate(f.verts)
                if (v.head[0] if isinstance(v.head, tuple) else v.head)
                == "snd"]
    assert snd_vids, "sibling projection not deduced"
    # and injectivity pushed snd(x) into b's class
    assert f.find(snd_vids[0]) == f.find(b)

    # general synthesis through the MetaMapper: pair-class constrained
    # by SumRelation (head == fst + snd)
    mapped = MappedFoil(f, MetaMapper({("sum", 2): SumRelation()}))
    graph = f.canonical_graph()
    values = {f.find(a): 7, f.find(b): 9, f.find(p): 16}
    cs = ConstraintSystem(BN256_SCALAR, check=True)
    mapped.synthesize(cs, values)
    assert cs.is_satisfied()
    cs2 = ConstraintSystem(BN256_SCALAR)
    mapped.synthesize(cs2, {**values, f.find(p): 17})
    assert not cs2.is_satisfied()


def test_schema_injectivity_propagates():
    """pair(a, b) ~ pair(c, d) forces a ~ c, b ~ d through the
    schema-registered constructor (constructors.rs simplification)."""
    from lurk_tpu.foil import Foil, Func, Schema

    schema = Schema()
    schema.add_constructor(Func.constructor(
        "pair", [Func("fst"), Func("snd")], metadata=("sum", 2)))
    f = Foil(schema)
    a, b, c, d = (f.add(("var", n)) for n in "abcd")
    p1 = f.add(("pair",), [a, b])
    p2 = f.add(("pair",), [c, d])
    f.assert_eq(p1, p2)
    f.finalize()
    assert f.find(a) == f.find(c)
    assert f.find(b) == f.find(d)
