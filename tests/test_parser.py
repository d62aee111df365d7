"""Parser tests mirroring reference src/parser/syntax.rs unit tests."""

import pytest

from lurk_tpu.fields import BN256_SCALAR as F
from lurk_tpu.parser import read_with_default_state, read_maybe_meta
from lurk_tpu.parser.syntax import (
    ParseError, Parser, SynChar, SynImproper, SynList, SynNum, SynQuote,
    SynString, SynSymbol, SynU64,
)
from lurk_tpu.store import Store
from lurk_tpu.store.printer import fmt_to_string, fmt_to_string_simple
from lurk_tpu.symbol import State, Symbol, lurk_sym, user_sym
from lurk_tpu.tags import ExprTag


def parse(s, state=None):
    p = Parser(F, state or State.init_lurk_state())
    return p.read(s)


def test_numeric_literals():
    # reference syntax.rs:890-980
    assert parse("00") == SynNum(0)
    assert parse("001") == SynNum(1)
    assert parse("0xf") == SynNum(15)
    assert parse("0xF") == SynNum(15)
    assert parse("0x0f") == SynNum(15)
    assert parse("0xffff_ffff_ffff_ffff") == SynNum(0xFFFFFFFFFFFFFFFF)
    # modulus-relative wrap
    assert parse(
        "0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000"
    ) == SynNum(F.modulus - 1)
    assert parse("-1") == SynNum(F.modulus - 1)
    assert parse(
        "0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000001"
    ) == SynNum(0)
    assert parse(
        "0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000002"
    ) == SynNum(1)
    assert parse("-0") == SynNum(0)
    # fractions are field division
    half = F.inv(2)
    assert parse("1/2") == SynNum(half)
    assert parse("-1/2") == SynNum((-half) % F.modulus)
    # uints
    assert parse("-1i64") == SynU64(2**64 - 1)
    assert parse("18446744073709551615u64") == SynU64(2**64 - 1)
    with pytest.raises(ParseError):
        parse("-1u64")
    with pytest.raises(ParseError):
        parse("18446744073709551616u64")
    for suf in ("u8", "u16", "u32", "u128", "i8", "i16", "i32", "i128"):
        with pytest.raises(ParseError):
            parse(f"0{suf}")


def test_symbols():
    st = State.init_lurk_state()
    assert parse("foo", st) == SynSymbol(user_sym("foo"))
    assert parse("lambda", st) == SynSymbol(lurk_sym("lambda"))
    assert parse(".lurk.lambda", st) == SynSymbol(lurk_sym("lambda"))
    assert parse(".a", st) == SynSymbol(Symbol.sym(["a"]))
    assert parse(":kw", st) == SynSymbol(Symbol.key(["kw"]))
    assert parse("~(foo bar)", st) == SynSymbol(Symbol.sym(["bar", "foo"]))
    assert parse("~:(foo bar)", st) == SynSymbol(Symbol.key(["bar", "foo"]))
    # escaped limb
    assert parse(".|foo bar|", st) == SynSymbol(Symbol.sym(["foo bar"]))
    assert parse(".\\.", st) == SynSymbol(Symbol.sym(["."]))
    # relative path creates nested packages
    got = parse("foo.bar", st)
    assert got == SynSymbol(user_sym("foo").direct_child("bar"))


def test_strings_chars():
    assert parse('"hello"') == SynString("hello")
    assert parse('"a\\nb"') == SynString("a\nb")
    assert parse('"\\u{41}"') == SynString("A")
    assert parse("'a'") == SynChar("a")
    assert parse("#\\a") == SynChar("a")
    assert parse("#\\u{1F600}") == SynChar("😀")


def test_lists():
    st = State.init_lurk_state()
    got = parse("(1 2 3)", st)
    assert got == SynList((SynNum(1), SynNum(2), SynNum(3)))
    got = parse("(1 . 2)", st)
    assert got == SynImproper((SynNum(1),), SynNum(2))
    got = parse("()", st)
    assert got == SynList(())
    got = parse("'(1)", st)
    assert isinstance(got, SynQuote)
    # .foo inside list is a symbol, not improper marker
    got = parse("(a .a)", st)
    assert got == SynList(
        (SynSymbol(user_sym("a")), SynSymbol(Symbol.sym(["a"])))
    )
    # comments skipped
    got = parse("(1 ;; comment\n 2)", st)
    assert got == SynList((SynNum(1), SynNum(2)))


def test_meta_forms():
    store = Store(F, use_device=False)
    state = State.init_lurk_state()
    res = read_maybe_meta(store, state, "!(prove (+ 1 1))")
    assert res is not None
    meta, ptr, _ = res
    assert meta
    head = store.fetch_proper_list(ptr)[0]
    assert store.fetch_symbol(head) == lurk_sym("meta").direct_child("prove")


def test_read_and_print_roundtrip():
    store = Store(F, use_device=False)
    state = State.init_lurk_state()
    cases = [
        "(1 2 3)",
        "(a b . c)",
        '"hi"',
        "'x'",
        "123u64",
        "(+ 1 (* 2 3))",
        "nil",
        "t",
        ":kw",
    ]
    for src in cases:
        from lurk_tpu.parser import read
        ptr = read(store, state, src)
        printed = fmt_to_string(ptr, store, state)
        ptr2 = read(store, state, printed)
        assert ptr == ptr2, f"{src} -> {printed}"


def test_print_formats():
    store = Store(F, use_device=False)
    state = State.init_lurk_state()
    from lurk_tpu.parser import read
    assert fmt_to_string(read(store, state, "(+ 1 2)"), store, state) == \
        "(+ 1 2)"
    assert fmt_to_string(read(store, state, "nil"), store, state) == "nil"
    assert fmt_to_string(read(store, state, "15u64"), store, state) == \
        "15u64"
    assert fmt_to_string(read(store, state, "-1"), store, state) == \
        "0x" + F.hex_digits(F.modulus - 1)
    # opaque comm printing (reference store.rs:1469)
    opq = store.comm(0)
    assert fmt_to_string_simple(opq, store) == (
        "<Opaque Comm 0x00000000000000000000000000000000"
        "00000000000000000000000000000000>"
    )
    comm = store.commit(store.num_u64(0))
    assert fmt_to_string_simple(comm, store) == (
        "(comm 0x1d501baeefe83acf0e7137180b091834"
        "f542a5059dbaf99ec82c5e19d3bb9201)"
    )
