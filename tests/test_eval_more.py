"""More evaluation parity cases: strings/chars, car/cdr semantics,
commitment operators, casts — pinned to the reference snapshots
(/root/reference/src/lem/tests/eval_tests.rs:1502-2330)."""

import pytest

from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.lem import evaluate
from lurk_tpu.parser import read_with_default_state
from lurk_tpu.store.core import Store
from lurk_tpu.tags import ContTag

TERMINAL = ContTag.Terminal
ERROR = ContTag.Error

CASES = [
    # strings / chars (:1502-1633)
    ('(car "apple")', r"#\a", TERMINAL, 2),
    ('(cdr "apple")', '"pple"', TERMINAL, 2),
    ('(car "")', "nil", TERMINAL, 2),
    ('(cdr "")', '""', TERMINAL, 2),
    (r'(cons #\a "pple")', r'(#\a . "pple")', TERMINAL, 3),
    (r'(strcons #\a "pple")', '"apple"', TERMINAL, 3),
    (r"(strcons #\a #\b)", None, ERROR, 3),
    ('(strcons "a" "b")', None, ERROR, 3),
    ("(strcons 1 2)", None, ERROR, 3),
    ("(strcons)", None, ERROR, 1),
    ('(cons "")', None, ERROR, 1),
    ("(car nil)", "nil", TERMINAL, 2),
    ("(cdr nil)", "nil", TERMINAL, 2),
    ("(car 'car)", None, ERROR, 2),
    # begin / current-env (:1830-1844)
    ("(let ((a 1)) (begin 123 (current-env)))", None, TERMINAL, 5),
    # hide / open / secret / commit (:1849-2210)
    ("(open (hide 123 'x))", "x", TERMINAL, 5),
    ("(open (commit 'x))", "x", TERMINAL, 4),
    ("(commit 123 456)", None, ERROR, 1),
    ("(open 123 456)", None, ERROR, 1),
    ("(secret 123 456)", None, ERROR, 1),
    ("(num 123 456)", None, ERROR, 1),
    ("(comm 123 456)", None, ERROR, 1),
    ("(char 123 456)", None, ERROR, 1),
    ("(secret (commit 123))", "0", TERMINAL, 4),
    ("(num 123)", "123", TERMINAL, 2),
    (r"(num #\a)", "97", TERMINAL, 2),
    ("(char 97)", r"#\a", TERMINAL, 2),
    (r"(char (+ 4294967296 97))", r"#\a", TERMINAL, 5),
    ("(open (comm (num (hide 123 456))))", "456", TERMINAL, 9),
    ("(secret (comm (num (hide 123 456))))", "123", TERMINAL, 9),
    ("(open (comm (num (commit 123))))", "123", TERMINAL, 8),
    ("(secret (comm (num (commit 123))))", "0", TERMINAL, 8),
    ("(open (num (commit 123)))", "123", TERMINAL, 6),
    # invalid casts (:2290-2330)
    ("(num (quote x))", None, ERROR, 2),
    ('(num "asdf")', None, ERROR, 2),
    ("(num '(1))", None, ERROR, 2),
    ("(comm (quote x))", None, ERROR, 2),
    ('(comm "asdf")', None, ERROR, 2),
    ("(comm '(1))", None, ERROR, 2),
    ("(char (quote x))", None, ERROR, 2),
    ('(char "asdf")', None, ERROR, 2),
    ("(char '(1))", None, ERROR, 2),
]


@pytest.fixture(scope="module")
def store():
    return Store(BN256_SCALAR, use_device=False)


@pytest.mark.parametrize("expr,expected,cont,iters", CASES,
                         ids=[c[0][:40] for c in CASES])
def test_eval_case(store, expr, expected, cont, iters):
    ptr = read_with_default_state(store, expr)
    frames = evaluate(None, ptr, store, 10000)
    out = frames[-1].output
    assert len(frames) == iters, \
        f"{expr}: {len(frames)} iterations != {iters}"
    assert out[2].tag == cont, f"{expr}: cont {out[2].tag:#06x}"
    if expected is not None:
        want = read_with_default_state(store, expected)
        assert store.hash_ptr(out[0]) == store.hash_ptr(want), \
            f"{expr}: wrong result"
