"""Chain server: chained functional commitments over HTTP JSON
(server semantics parity with reference chain-server/src/server.rs)."""

import json
import urllib.request

import pytest

from lurk_tpu.cli.chain_server import ChainState, serve
from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.parser import read_with_default_state
from lurk_tpu.lem import evaluate
from lurk_tpu.store.core import Store


@pytest.fixture()
def store():
    return Store(BN256_SCALAR, use_device=False)


def _mk_counter_callable(store):
    src = """(letrec ((add (lambda (counter x)
                  (let ((counter (+ counter x)))
                    (cons counter (add counter))))))
              (add 0))"""
    expr = read_with_default_state(store, src)
    frames = evaluate(None, expr, store, 100)
    return frames[-1].output[0]


def test_chain_state_chains(store, tmp_path, monkeypatch):
    monkeypatch.setenv("LURK_TPU_CACHE", str(tmp_path))
    state = ChainState(store, _mk_counter_callable(store), rc=4,
                       limit=1000)
    r1 = state.chain(store.num(3), prove=False)
    assert "error" not in r1
    # result root digest corresponds to Num(3)
    root = r1["result"]["root"]
    assert int(root["digest"], 16) == 3
    r2 = state.chain(store.num(4), prove=False)
    assert int(r2["result"]["root"]["digest"], 16) == 7
    assert r1["next_callable"] != r2["next_callable"]
    # session dump/resume
    sess = tmp_path / "session.json"
    state.dump_session(sess)
    store2 = Store(BN256_SCALAR, use_device=False)
    state2 = ChainState.resume(sess, store2)
    r3 = state2.chain(store2.num(5), prove=False)
    assert int(r3["result"]["root"]["digest"], 16) == 12


def test_stream_service_incremental(store, tmp_path, monkeypatch):
    """StreamService parity (server.rs:227-440): 3 chained calls extend
    ONE RecursiveSNARK; the session (incl. the accumulator) survives a
    server restart and the resumed proof still covers every call."""
    monkeypatch.setenv("LURK_TPU_CACHE", str(tmp_path))
    from lurk_tpu.cli.chain_server import StreamState
    from lurk_tpu.proof import prover_cycle as pcy

    sess = tmp_path / "stream_session.json"
    state = StreamState(store, _mk_counter_callable(store), rc=4,
                        limit=1000, session=sess)
    r1 = state.chain(store.num(3))
    assert r1["proof_verified"] and r1["calls"] == 1
    assert int(r1["result"]["root"]["digest"], 16) == 3
    r2 = state.chain(store.num(4))
    assert r2["proof_verified"] and r2["calls"] == 2
    assert int(r2["result"]["root"]["digest"], 16) == 7
    # ONE proof covers both calls: the accumulator step count grows
    assert r2["proof_steps"] > r1["proof_steps"]
    r3 = state.chain(store.num(5))
    assert int(r3["result"]["root"]["digest"], 16) == 12
    assert r3["proof_steps"] > r2["proof_steps"]

    # kill the server; resume from the session dump in a FRESH store
    store2 = Store(BN256_SCALAR, use_device=False)
    state2 = StreamState.resume(sess, store2)
    assert state2.calls == 3
    r4 = state2.chain(store2.num(10))
    assert r4["proof_verified"]
    assert int(r4["result"]["root"]["digest"], 16) == 22
    assert r4["proof_steps"] > r3["proof_steps"]
    # the final incremental proof verifies under the cycle verifier
    proof = state2.snark.finish()
    assert pcy.CycleNovaProver.verify(state2.pp, proof)


def test_http_endpoints(store, tmp_path, monkeypatch):
    monkeypatch.setenv("LURK_TPU_CACHE", str(tmp_path))
    state = ChainState(store, _mk_counter_callable(store), limit=1000)
    server = serve(state, port=0)
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/config") as resp:
            cfg = json.loads(resp.read())
        assert cfg["field"] == "bn256"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/chain",
            data=json.dumps({"arg_num": 10}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as resp:
            out = json.loads(resp.read())
        assert int(out["result"]["root"]["digest"], 16) == 10
        assert out["next_callable"].startswith("0x")
    finally:
        server.shutdown()


def test_grpc_chain_roundtrip(tmp_path, monkeypatch):
    """Real gRPC transport (proto service chain_prover.ChainProver):
    Config + two chained calls over the counter example."""
    pytest.importorskip("grpc")
    monkeypatch.setenv("LURK_TPU_CACHE", str(tmp_path))
    from lurk_tpu.cli.chain_server import (
        ChainState, GrpcChainClient, serve_grpc,
    )
    from lurk_tpu.fields import BN256_SCALAR
    from lurk_tpu.lem import evaluation as ev
    from lurk_tpu.parser import read_with_default_state
    from lurk_tpu.store.core import Store

    store = Store(BN256_SCALAR)
    src = ("(letrec ((add (lambda (counter x)"
           " (let ((counter (+ counter x)))"
           " (cons counter (commit (add counter)))))))"
           " (add 0))")
    expr = read_with_default_state(store, src)
    frames = ev.evaluate(None, expr, store, 10000)
    callable_ptr = frames[-1].output[0]
    state = ChainState(store, callable_ptr, rc=5, limit=10000)
    server, port = serve_grpc(state, port=0)
    try:
        client = GrpcChainClient(f"127.0.0.1:{port}")
        cfg = client.config()
        assert cfg["field"] == "bn256" and cfg["rc"] == 5
        r1 = client.chain("9", prove=False)
        assert r1["next_callable"].startswith("0x")
        r2 = client.chain("12", prove=False)
        assert r2["next_callable"] != r1["next_callable"]
    finally:
        server.stop(0)
