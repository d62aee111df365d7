"""Warm fib(n)/rc e2e on the DEFAULT backend (supernova-cycle,
compressed): prove + compress + verify with span traces.

Usage: python scripts/fib_e2e.py [n] [rc]   (defaults 100 100)
Run twice for the warm number (param caches, jax cache, SRS).
"""
import logging
import os
import sys
import time

os.environ.setdefault("LURK_TPU_TRACE", "1")
logging.basicConfig(level=logging.INFO, format="%(message)s")

n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
rc = int(sys.argv[2]) if len(sys.argv) > 2 else 100

from lurk_tpu.fields import BN256_SCALAR                     # noqa: E402
from lurk_tpu.lem import evaluation as ev                    # noqa: E402
from lurk_tpu.lem.evaluation import Lang                     # noqa: E402
from lurk_tpu.parser import read_with_default_state          # noqa: E402
from lurk_tpu.proof import prover_supernova_cycle as psc     # noqa: E402
from lurk_tpu.store.core import Store                        # noqa: E402
from lurk_tpu.utils.tracing import span                      # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from examples.fib import FIB_PROGRAM, fib_limit              # noqa: E402

store = Store(BN256_SCALAR)
expr = read_with_default_state(store, FIB_PROGRAM)
limit = fib_limit(n, rc)
t0 = time.time()
frames = ev.evaluate(None, expr, store, limit)
print(f"eval: {len(frames)} frames {time.time()-t0:.1f}s", flush=True)

prover = psc.SuperNovaCycleProver(rc=rc, lang=Lang())
t0 = time.time()
with span("fib.prove"):
    pp, proof = prover.prove_from_frames(store, frames)
t_prove = time.time() - t0
print(f"prove: {t_prove:.1f}s", flush=True)

t0 = time.time()
with span("fib.compress"):
    cp = psc.compress_sn_cycle(pp, proof)
t_comp = time.time() - t0
print(f"compress: {t_comp:.1f}s", flush=True)

t0 = time.time()
with span("fib.verify"):
    ok = psc.verify_compressed_sn_cycle(pp, cp)
t_ver = time.time() - t0
assert ok
print(f"verify: {t_ver:.1f}s", flush=True)
print(f"E2E {t_prove + t_comp + t_ver:.1f}s "
      f"(prove {t_prove:.1f} + compress {t_comp:.1f} + "
      f"verify {t_ver:.1f}); frames/s "
      f"{len(frames) / (t_prove + t_comp + t_ver):.1f}", flush=True)
