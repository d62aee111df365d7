"""Circuit-interpreter equivalence harness.

Mirrors the reference's core correctness pattern
(/root/reference/src/proof/tests/mod.rs:161-279): for each test expression,
every frame must (a) synthesize into a SATISFIED constraint system and
(b) produce the IDENTICAL circuit shape as every other frame — including a
blank frame (uniformity requirement for folding).
"""

import pytest

from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.lem import evaluate, eval_step
from lurk_tpu.lem.circuit import synthesize_frame
from lurk_tpu.lem.interpreter import Frame
from lurk_tpu.parser import read_with_default_state
from lurk_tpu.r1cs.cs import ConstraintSystem
from lurk_tpu.store.core import Store

EXPRS = [
    "(+ 1 2)",
    "((lambda (x) (* x x)) 5)",
    "(let ((a 1) (b 2)) (if (< a b) (cons a b) nil))",
    "(u64 100)",
    "(/ 10u64 3u64)",
    "(% 10u64 3u64)",
    "((commit (lambda (x) x)) nil)",
    "(eq (quote (1 2)) (cons 1 (cons 2 nil)))",
    '(strcons \'a\' "bc")',
]


@pytest.fixture(scope="module")
def store():
    return Store(BN256_SCALAR, use_device=False)


def synth(store, frame, check):
    cs = ConstraintSystem(BN256_SCALAR, check=check)
    synthesize_frame(cs, eval_step(), store, frame)
    return cs


@pytest.mark.parametrize("expr_str", EXPRS)
def test_frames_satisfied_and_uniform(store, expr_str):
    expr = read_with_default_state(store, expr_str)
    frames = evaluate(None, expr, store, 200)
    assert len(frames) >= 1
    digests = set()
    for frame in frames[:4] + frames[-1:]:
        cs = synth(store, frame, check=True)
        assert cs.is_satisfied()
        digests.add(cs.shape_digest())
    assert len(digests) == 1, "shape differs across frames"


def test_blank_frame_shape_matches(store):
    expr = read_with_default_state(store, "(+ 1 2)")
    frames = evaluate(None, expr, store, 10)
    cs_real = synth(store, frames[0], check=True)
    blank = Frame.blank_frame(eval_step(), 0, store)
    cs_blank = synth(store, blank, check=False)
    assert cs_real.shape_digest() == cs_blank.shape_digest()
    assert cs_real.num_aux == cs_blank.num_aux


def test_circuit_size_pinned(store):
    """Pin OUR universal step circuit size — BELOW the reference's
    11141 constraints / 9119 aux (eval.rs:1966-1967): free constants,
    3-constraint S-boxes, bellpepper-cost strict bit decomposition
    (354 on BN256), 1-constraint Boolean::and."""
    blank = Frame.blank_frame(eval_step(), 0, store)
    cs = synth(store, blank, check=False)
    # snapshot (update deliberately when the circuit changes):
    assert cs.num_constraints == 11057, cs.num_constraints
    assert cs.num_aux == 9029, cs.num_aux
    assert cs.num_constraints <= 11141, "reference parity bar"
    assert cs.num_aux <= 9119, "reference parity bar"
