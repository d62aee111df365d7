"""Full end-to-end runs of the reference's prove-heavy demo files
(vdf.lurk ~67k iterations proved; bank.lurk), including their hard-coded
!(verify) proof keys. ~4-10 min each on CPU, so gated behind
LURK_TPU_SLOW_DEMOS=1 (the fast claim-key parity lives in
test_demo_parity.py). Verified green in round 3: vdf 256s, bank 679s
(4-core host, supernova backend, rc=10)."""

import os
import pathlib

import pytest

from lurk_tpu.cli.repl import Repl
from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.store.core import Store

DEMO = "/root/reference/demo"

slow = pytest.mark.skipif(
    not os.environ.get("LURK_TPU_SLOW_DEMOS"),
    reason="set LURK_TPU_SLOW_DEMOS=1 to run prove-heavy demo files")


@slow
@pytest.mark.parametrize("demo", ["vdf.lurk", "bank.lurk"])
def test_demo_end_to_end(demo, tmp_path, monkeypatch):
    monkeypatch.setenv("LURK_TPU_CACHE", str(tmp_path))
    repl = Repl(Store(BN256_SCALAR), rc=10, backend="supernova")
    repl.load_file(pathlib.Path(DEMO) / demo)
