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
