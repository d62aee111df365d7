"""Field-ordering comparison semantics — the reference's full
test_relational matrix (eval_tests.rs:2360-2493) plus the u64
relational edge cases (:2996-3060). Field elements are 'negative' when
they exceed most_positive (field.rs most_positive/most_negative); every
comparison evaluates in exactly 3 iterations."""

import pytest

from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.store.core import Store
from lurk_tpu.tags import ContTag
from tests.test_eval import check

P = BN256_SCALAR.modulus
MOST_POSITIVE = BN256_SCALAR.most_positive
MOST_NEGATIVE = BN256_SCALAR.most_negative
NEG_ONE = P - 1

TERMINAL = ContTag.Terminal


@pytest.fixture(scope="module")
def store():
    return Store(BN256_SCALAR)


def lit(v) -> str:
    return hex(v) if isinstance(v, int) else v


# (a, b, lt, gt, lte, gte) — one row per reference relational_aux group
MATRIX = [
    ("1", "2", True, False, True, False),
    ("2", "1", False, True, False, True),
    ("1", "1", False, False, True, True),
    ("0", "2", True, False, True, False),
    ("2", "0", False, True, False, True),
    ("0", "0", False, False, True, True),
    (MOST_NEGATIVE, "0", True, False, True, False),
    ("0", MOST_NEGATIVE, False, True, False, True),
    (MOST_NEGATIVE, MOST_POSITIVE, True, False, True, False),
    (MOST_POSITIVE, MOST_NEGATIVE, False, True, False, True),
    (MOST_NEGATIVE, MOST_NEGATIVE, False, False, True, True),
    ("1", MOST_POSITIVE, True, False, True, False),
    (MOST_POSITIVE, "1", False, True, False, True),
    ("1", MOST_NEGATIVE, False, True, False, True),
    (MOST_NEGATIVE, "1", True, False, True, False),
    (NEG_ONE, MOST_POSITIVE, True, False, True, False),
    (MOST_POSITIVE, NEG_ONE, False, True, False, True),
    (NEG_ONE, MOST_NEGATIVE, False, True, False, True),
    (MOST_NEGATIVE, NEG_ONE, True, False, True, False),
]


@pytest.mark.parametrize("row", MATRIX,
                         ids=[f"{i}" for i in range(len(MATRIX))])
def test_relational_matrix(store, row):
    a, b, lt, gt, lte, gte = row
    for op, res in (("<", lt), (">", gt), ("<=", lte), (">=", gte)):
        expr = f"({op} {lit(a)} {lit(b)})"
        check(store, expr, "t" if res else "nil", TERMINAL, 3)


def test_u64_relational_edge_cases(store):
    """eval_tests.rs test_relational_edge_case_identity / test_u64_comp."""
    cases = [
        ("(< 0u64 1u64)", True), ("(< 1u64 0u64)", False),
        ("(<= 0u64 1u64)", True), ("(<= 1u64 0u64)", False),
        ("(> 0u64 1u64)", False), ("(> 1u64 0u64)", True),
        ("(>= 0u64 1u64)", False), ("(>= 1u64 0u64)", True),
        ("(<= 0u64 0u64)", True), ("(>= 0u64 0u64)", True),
        ("(= 0u64 0u64)", True), ("(= 0u64 1u64)", False),
    ]
    for expr, res in cases:
        check(store, expr, "t" if res else "nil", TERMINAL, 3)


def test_u64_div_mod_by_zero_errors(store):
    """eval_tests.rs test_u64_div/mod zero divisors error."""
    check(store, "(/ 1u64 0u64)", None, ContTag.Error, 3)
    check(store, "(% 1u64 0u64)", None, ContTag.Error, 3)


def test_u64_num_conversion_semantics(store):
    """eval_tests.rs test_u64_conversion / _num_comparison / _num_cons /
    _hide_u64_secret: u64<->num coercions, mixed =, mixed cons."""
    check(store, "(+ 0 1u64)", "1", TERMINAL, 3)
    check(store, "(num 1u64)", "1", TERMINAL, 2)
    check(store, "(+ 1 1u64)", "2", TERMINAL, 3)
    check(store, "(u64 (+ 1 1))", "2u64", TERMINAL, 5)
    check(store, "(u64 123u64)", "123u64", TERMINAL, 2)
    check(store, "(u64)", None, ContTag.Error, 1)
    check(store, "(u64 1 1)", None, ContTag.Error, 1)
    check(store, "(= 1 1u64)", "t", TERMINAL, 3)
    check(store, "(= 1 2u64)", "nil", TERMINAL, 3)
    check(store, "(cons 1 1u64)", "(1 . 1u64)", TERMINAL, 3)
    check(store, "(cons 1u64 1)", "(1u64 . 1)", TERMINAL, 3)
    check(store, "(hide 0u64 123)", None, ContTag.Error, 3)


def test_num_syntax_implications(store):
    """eval_tests.rs:2543-2600 — rational literals are field division."""
    check(store, "(= (* 6 3/2) 9)", "t", TERMINAL, 6)
    check(store, "(= (* 2/3 3/2) 1)", "t", TERMINAL, 6)
    check(store, "(= (* -2/3 3/2) -1)", "t", TERMINAL, 6)
    check(store,
          "(let ((most-positive -1/2) (most-negative 1/2))"
          " (< most-negative most-positive))", "t", TERMINAL, 7)


def test_keyword(store):
    """eval_tests.rs:3345 — keywords self-evaluate, distinct from syms."""
    check(store, ":asdf", ":asdf", TERMINAL, 1)
    check(store, "(eq :asdf :asdf)", "t", TERMINAL, 3)
    check(store, "(eq :asdf 'asdf)", "nil", TERMINAL, 3)


def test_eval_op_semantics(store):
    """eval_tests.rs:2678-2760 — the eval special form (1- and 2-arg)."""
    check(store, "(* 3 (eval (cons '+ (cons 1 (cons 2 nil)))))", "9",
          TERMINAL, 17)
    check(store, "(* 5 (eval '(+ 1 a) (let ((a 3)) (current-env))))",
          "20", TERMINAL, 11)
    check(store, "(let ((a 1)) (eval 'a))", None, ContTag.Error, 5)
    check(store, "(let ((a 1)) (eval 'a (current-env)))", "1",
          TERMINAL, 6)


def test_eval_bad_form(store):
    """eval_tests.rs:3492-3560 — malformed envs and dotted applications
    error at the reference's exact iteration counts."""
    check(store, "(* 5 (eval '(+ 1 a) '((0 . 3))))", None,
          ContTag.Error, 5)
    check(store, "(let ((a (lambda (x) (+ x 1)))) (a . 1))", None,
          ContTag.Error, 3)
