"""CLI integration: spawn the real CLI end-to-end (parity with the
reference's tests/lurk-cli-tests.rs prove+verify roundtrip)."""

import json
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, tmp_path, input_text=None, timeout=500):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["LURK_TPU_CACHE"] = str(tmp_path / "cache")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "lurk_tpu.cli"] + args,
        capture_output=True, text=True, timeout=timeout, env=env,
        input=input_text, cwd=REPO)


def test_load_demo_simple(tmp_path):
    r = run_cli(["load", "/root/reference/demo/simple.lurk",
                 "--limit", "100000"], tmp_path)
    assert r.returncode == 0, r.stderr
    assert "[6 iterations] => 64" in r.stdout
    assert "[6 iterations] => 8" in r.stdout


def test_prove_verify_roundtrip(tmp_path):
    """Default path pins the succinct cycle backend + compression
    (reference always proves+compresses+verifies, repl/mod.rs:303-401;
    default backend cli/mod.rs:85-99)."""
    src = tmp_path / "t.lurk"
    src.write_text("!(prove (+ 1 2))\n")
    r = run_cli(["load", str(src), "--rc", "2", "--limit", "1000"],
                tmp_path)
    assert r.returncode == 0, r.stderr
    m = re.search(r'Proof key: "([^"]+)"', r.stdout)
    assert m, r.stdout
    proof_key = m.group(1)
    assert proof_key.startswith("supernova-cycle_bn256_2_")
    proof_file = (tmp_path / "cache" / "proofs"
                  / f"{proof_key}.proof.json")
    assert json.loads(proof_file.read_text())["kind"] == "compressed"
    r2 = run_cli(["verify", proof_key, "--rc", "2"], tmp_path)
    assert r2.returncode == 0, r2.stderr + r2.stdout
    assert "Proof verified" in r2.stdout


def test_supernova_backend_roundtrip(tmp_path):
    src = tmp_path / "t.lurk"
    src.write_text("!(prove (* 2 3))\n")
    r = run_cli(["load", str(src), "--rc", "2", "--limit", "1000",
                 "--backend", "supernova-fold"], tmp_path)
    assert r.returncode == 0, r.stderr
    m = re.search(r'Proof key: "([^"]+)"', r.stdout)
    assert m, r.stdout
    assert m.group(1).startswith("supernova-fold_")
    r2 = run_cli(["verify", m.group(1), "--rc", "2"], tmp_path)
    assert r2.returncode == 0, r2.stderr + r2.stdout
    assert "Proof verified" in r2.stdout
