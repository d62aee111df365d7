"""Protocol meta commands end-to-end (defprotocol / prove-protocol /
verify-protocol), mirroring the reference's defprotocol example
(meta_cmd.rs:689-1033) and demo/protocol.lurk."""

import os

import pytest

from lurk_tpu.cli.repl import Repl, ReplError
from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.store.core import Store


@pytest.fixture()
def repl(tmp_path):
    store = Store(BN256_SCALAR, use_device=False)
    return Repl(store, rc=4, limit=100_000)


PROTOCOL_SRC = """
!(defprotocol my-protocol (hash pair)
  (let ((list6 (lambda (a b c d e f)
                 (cons a (cons b (cons c (cons d (cons e (cons f nil))))))))
        (mk-open-expr (lambda (hash) (cons 'open (cons hash nil)))))
    (cons
      (if (= (+ (car pair) (cdr pair)) 30)
        (list6 (mk-open-expr hash) (empty-env) :outermost pair (empty-env) :terminal)
        nil)
      (lambda () (> (car pair) 10))))
  :rc 4
  :description "example protocol")
"""


def test_protocol_roundtrip(repl, tmp_path, capsys):
    repl.load_string(PROTOCOL_SRC)
    # commit '(13 . 17) so the open in the protocol can resolve
    repl.load_string("!(commit '(13 . 17))")
    out = capsys.readouterr().out
    comm_hash = [line for line in out.splitlines()
                 if line.startswith("Hash: ")][0].split()[1]
    proof_path = tmp_path / "protocol-proof"
    repl.load_string(
        f'!(prove-protocol my-protocol "{proof_path}" '
        f"{comm_hash} '(13 . 17))")
    out = capsys.readouterr().out
    assert "Protocol proof saved" in out
    repl.load_string(f'!(verify-protocol my-protocol "{proof_path}")')
    out = capsys.readouterr().out
    assert "Protocol proof verified" in out


def test_protocol_rejects_bad_pair(repl, tmp_path, capsys):
    repl.load_string(PROTOCOL_SRC)
    repl.load_string("!(commit '(13 . 18))")  # 13+18 != 30
    out = capsys.readouterr().out
    comm_hash = [line for line in out.splitlines()
                 if line.startswith("Hash: ")][0].split()[1]
    with pytest.raises(ReplError, match="rejected"):
        repl.load_string(
            f'!(prove-protocol my-protocol "{tmp_path}/p" '
            f"{comm_hash} '(13 . 18))")
