"""Span tracing (utils/tracing.py — the reference's tracing+TeXRay
analogue, src/main.rs:10-16)."""

import logging


def test_span_tree_logged(monkeypatch, caplog):
    monkeypatch.setenv("LURK_TPU_TRACE", "1")
    from lurk_tpu.utils import tracing

    with caplog.at_level(logging.INFO, logger="lurk_tpu.tracing"):
        with tracing.span("outer"):
            with tracing.span("inner"):
                pass
    text = "\n".join(r.getMessage() for r in caplog.records)
    assert "outer" in text and "  inner" in text


def test_disabled_is_noop(monkeypatch, caplog):
    monkeypatch.delenv("LURK_TPU_TRACE", raising=False)
    from lurk_tpu.utils import tracing

    with caplog.at_level(logging.INFO, logger="lurk_tpu.tracing"):
        with tracing.span("outer"):
            pass
    assert not caplog.records


def test_instrument_decorator(monkeypatch, caplog):
    monkeypatch.setenv("LURK_TPU_TRACE", "1")
    from lurk_tpu.utils import tracing

    @tracing.instrument("custom.label")
    def f(x):
        return x + 1

    with caplog.at_level(logging.INFO, logger="lurk_tpu.tracing"):
        assert f(1) == 2
    assert any("custom.label" in r.getMessage() for r in caplog.records)
