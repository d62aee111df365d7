"""Streaming evaluation: StreamStart -> StreamDispatch -> StreamPause
and resume_stream (parity: reference src/proof/tests/stream.rs flow)."""

import pytest

from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.lem import dummy_channel, resume_stream, start_stream
from lurk_tpu.parser import read_with_default_state
from lurk_tpu.store.core import Store
from lurk_tpu.tags import ContTag


@pytest.fixture()
def store():
    return Store(BN256_SCALAR, use_device=False)


def test_stream_start_and_resume(store):
    # callable keeps a running sum: returns (result . next-callable)
    src = """(letrec ((add (lambda (counter x)
                  (let ((counter (+ counter x)))
                    (cons counter (add counter))))))
              (add 0))"""
    callable_ = read_with_default_state(store, src)
    ch = dummy_channel()
    ch.feed(store.num(3))          # first streamed argument
    frames = start_stream(None, callable_, store, 500, ch)
    out = frames[-1].output
    assert out[2].tag == ContTag.StreamPause
    result_pair = out[0]
    car, _cdr = store.car_cdr(result_pair)
    assert store.fetch_num(car) == 3

    # resume with another argument; stutter flag nil = continue
    ch.feed(store.intern_nil())    # no stutter
    ch.feed(store.num(4))          # next streamed argument
    frames = resume_stream(None, list(out), store, 500, ch)
    out = frames[-1].output
    assert out[2].tag == ContTag.StreamPause
    car, _ = store.car_cdr(out[0])
    assert store.fetch_num(car) == 7


def test_stream_stutter(store):
    src = """(letrec ((add (lambda (counter x)
                  (let ((counter (+ counter x)))
                    (cons counter (add counter))))))
              (add 0))"""
    callable_ = read_with_default_state(store, src)
    ch = dummy_channel()
    ch.feed(store.num(1))
    frames = start_stream(None, callable_, store, 500, ch)
    out = frames[-1].output
    # stutter: non-nil flag keeps the paused state unchanged
    ch.feed(store.intern_t())
    frames = resume_stream(None, list(out), store, 3, ch)
    for f in frames:
        assert f.output == f.input or f.output[2].tag == \
            ContTag.StreamPause
    assert frames[-1].output[0] == out[0]
