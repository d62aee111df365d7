"""Evaluation parity tests: results, continuations and EXACT iteration
counts pinned to the reference's snapshot tests
(/root/reference/src/lem/tests/eval_tests.rs)."""

import pytest

from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.lem import dummy_channel, evaluate
from lurk_tpu.parser import read_with_default_state
from lurk_tpu.store.core import Store
from lurk_tpu.tags import ContTag

LIMIT = 10000


def run(store, expr_str, limit=LIMIT, channel=None):
    expr = read_with_default_state(store, expr_str)
    frames = evaluate(None, expr, store, limit, channel)
    out = frames[-1].output
    return out, len(frames)


def check(store, expr_str, expected_src, cont_tag, iterations):
    out, iters = run(store, expr_str)
    assert iters == iterations, \
        f"{expr_str}: {iters} iterations != {iterations}"
    assert out[2].tag == cont_tag, f"{expr_str}: cont {out[2].tag:#06x}"
    if expected_src is not None:
        expected = read_with_default_state(store, expected_src)
        assert store.hash_ptr(out[0]) == store.hash_ptr(expected), \
            f"{expr_str}: wrong result"


TERMINAL = ContTag.Terminal
ERROR = ContTag.Error

# (expr, expected_result_source_or_None, cont_tag, iterations)
# Every tuple mirrors a reference test (eval_tests.rs line cited per group).
CASES = [
    # self-evaluating (:159-192)
    ("999", "999", TERMINAL, 1),
    ("t", "t", TERMINAL, 1),
    ("nil", "nil", TERMINAL, 1),
    (":key", ":key", TERMINAL, 1),
    ('"str"', '"str"', TERMINAL, 1),
    # cons / emit (:199-236)
    ("(cons 1 2)", "(1 . 2)", TERMINAL, 3),
    ("(emit 123)", "123", TERMINAL, 3),
    # lambdas (:239-351)
    ("((lambda (x) x) 123)", "123", TERMINAL, 4),
    ("((lambda () 123))", "123", TERMINAL, 3),
    ("((lambda (y) ((lambda (x) y) 321)) 123)", "123", TERMINAL, 7),
    ("((lambda (y) ((lambda (x) ((lambda (z) z) x)) y)) 123)", "123",
     TERMINAL, 10),
    ("((lambda (y) ((lambda (x) ((lambda (z) z) x)) 888)) 999)", "888",
     TERMINAL, 10),
    ("(((lambda (fn) (lambda (x) (fn x))) (lambda (y) y)) 999)", "999",
     TERMINAL, 10),
    # commitments as callables (:355-390, 413-491)
    ("((commit (lambda (x) x)) nil)", "nil", TERMINAL, 6),
    ("((num (commit (lambda (x) x))) nil)", "nil", TERMINAL, 8),
    # arithmetic (:494-559)
    ("(+ 2 (+ 3 4))", "9", TERMINAL, 6),
    ("(- 9 5)", "4", TERMINAL, 3),
    ("(* 9 5)", "45", TERMINAL, 3),
    ("(/ 21 7)", "3", TERMINAL, 3),
    ("(/ 21 0)", None, ERROR, 3),
    # num equality (:563-595)
    ("(= 5 5)", "t", TERMINAL, 3),
    ("(= 5 6)", "nil", TERMINAL, 3),
    # adders (:601-635)
    ("(((lambda (x) (lambda (y) (+ x y))) 2) 3)", "5", TERMINAL, 9),
    ("(let ((make-adder (lambda (x) (lambda (y) (+ x y)))))"
     " ((make-adder 2) 3))", "5", TERMINAL, 11),
    # let / letrec (:641-768)
    ("(let ((a 1)) a)", "1", TERMINAL, 3),
    ("(let () (+ 1 2))", "3", TERMINAL, 4),
    ("(let ((a 1) (b 2)) (+ a b))", "3", TERMINAL, 7),
    ("(let)", None, ERROR, 1),
    ("(let ((a 1)))", None, ERROR, 1),
    ("(letrec)", None, ERROR, 1),
    ("(letrec ((a 1)))", None, ERROR, 1),
    ("(eq nil (let () nil))", "t", TERMINAL, 4),
    ("(let ((a 1) (b a)) b)", "1", TERMINAL, 5),
    # recursion (:913-1134)
    ("""(letrec ((exp (lambda (base)
                          (lambda (exponent)
                            (if (= 0 exponent)
                                1
                                (* base ((exp base) (- exponent 1))))))))
           ((exp 5) 3))""", "125", TERMINAL, 64),
    ("""(letrec ((exp (lambda (base exponent)
                          (if (= 0 exponent)
                              1
                              (* base (exp base (- exponent 1)))))))
                  (exp 5 3))""", "125", TERMINAL, 56),
    ("""(letrec ((exp (lambda (base)
                         (lambda (exponent)
                            (lambda (acc)
                              (if (= 0 exponent)
                                 acc
                                 (((exp base) (- exponent 1)) (* acc base))))))))
           (((exp 5) 5) 1))""", "3125", TERMINAL, 117),
    ("""(letrec ((double (lambda (x) (* 2 x)))
                   (square (lambda (x) (* x x))))
           (+ (square 3) (double 2)))""", "13", TERMINAL, 19),
    ("""(letrec ((double (lambda (x) (* 2 x)))
                   (double-inc (lambda (x) (+ 1 (double x)))))
           (+ (double 3) (double-inc 2)))""", "11", TERMINAL, 25),
    ("""(letrec ((exp (lambda (base exponent)
                          (if (= 0 exponent)
                              1
                              (* base (exp base (- exponent 1))))))
                   (exp2 (lambda (base exponent)
                          (if (= 0 exponent)
                              1
                              (* base (exp2 base (- exponent 1))))))
                   (exp3 (lambda (base exponent)
                          (if (= 0 exponent)
                              1
                              (* base (exp3 base (- exponent 1)))))))
           (+ (+ (exp 3 2) (exp2 2 3))
              (exp3 4 2)))""", "33", TERMINAL, 144),
]


@pytest.fixture(scope="module")
def store():
    return Store(BN256_SCALAR, use_device=False)


@pytest.mark.parametrize("expr,expected,cont,iters", CASES,
                         ids=[c[0][:40] for c in CASES])
def test_eval_case(store, expr, expected, cont, iters):
    check(store, expr, expected, cont, iters)


def test_emit_channel(store):
    ch = dummy_channel()
    out, _ = run(store, "(emit 123)", channel=ch)
    assert len(ch.outbound) == 1
    assert store.fetch_num(ch.outbound[0]) == 123


def test_step_slot_counts():
    """Pinned slot counts of the universal step circuit
    (eval.rs:1961-1965)."""
    from lurk_tpu.lem import eval_step
    sc = eval_step().slots_count
    assert sc.hash4 == 14
    assert sc.hash6 == 0
    assert sc.hash8 == 6
    assert sc.commitment == 1
    assert sc.bit_decomp == 3


def test_u64_semantics(store):
    # u64 wrap-around semantics (reference uint tests)
    check(store, "(+ 18446744073709551615u64 1u64)", "0u64", TERMINAL, 3)
    check(store, "(- 0u64 1u64)", "18446744073709551615u64", TERMINAL, 3)
    check(store, "(* 18446744073709551615u64 2u64)",
          "18446744073709551614u64", TERMINAL, 3)
    check(store, "(/ 21u64 2u64)", "10u64", TERMINAL, 3)
    check(store, "(% 21u64 2u64)", "1u64", TERMINAL, 3)
    check(store, "(< 1u64 2u64)", "t", TERMINAL, 3)
    check(store, "(u64 18446744073709551617)", "1u64", TERMINAL, 2)
