"""Interleaved A/B: pallas_nib12 (6th gen, dense rounds) vs
pallas_nib12_opt (7th gen, sparse partial rounds) on the real chip.

Measurement rules (CLAUDE.md): pipelined dispatch, FRESH inputs per
call (same-input reuse gives bogus-fast numbers on the tunnel),
interleaved repeats (chip state drifts between processes).

Usage: python scripts/ab_nib12_opt.py [arity] [log2_batch] [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lurk_tpu.fields import PALLAS_SCALAR
from lurk_tpu.ops import limbs as L
from lurk_tpu.poseidon.host import hash_preimage

arity = int(sys.argv[1]) if len(sys.argv) > 1 else 4
batch = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 17)
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
PIPE = 8

from lurk_tpu.poseidon.pallas_nib12 import build_pallas_nib12_hasher
from lurk_tpu.poseidon.pallas_nib12_opt import build_pallas_nib12_opt_hasher

h_base = jax.jit(build_pallas_nib12_hasher(PALLAS_SCALAR, arity, 2048,
                                           vmem_limit=100 << 20))
h_opt = jax.jit(build_pallas_nib12_opt_hasher(PALLAS_SCALAR, arity, 2048,
                                              vmem_limit=100 << 20))

f = L.limb_field(PALLAS_SCALAR)
rng = np.random.default_rng(7)
# fresh device inputs, pre-uploaded (we time kernel, not upload)
xs = [jnp.asarray(rng.integers(0, 1 << 16, size=(arity, L.N_LIMBS, batch),
                               dtype=np.uint32)) for _ in range(PIPE)]
jax.block_until_ready(xs)

for name, h in (("base", h_base), ("opt", h_opt)):
    t0 = time.perf_counter()
    out = np.asarray(h(xs[0]))
    print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
          flush=True)
    for lane in (0, 7, batch - 1):
        pre = f.to_ints(np.asarray(xs[0][:, :, lane:lane + 1]).reshape(
            arity, L.N_LIMBS, 1))
        expect = hash_preimage(PALLAS_SCALAR, pre)
        got = f.to_ints(out[:, lane:lane + 1].reshape(1, L.N_LIMBS, 1))[0]
        assert got == expect, f"{name} lane {lane}: digest mismatch"
    print(f"{name}: bit-exact vs host oracle", flush=True)


def timed(h):
    outs = [h(x) for x in xs]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [h(x) for x in xs]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    return batch * PIPE / dt


for r in range(reps):
    a = timed(h_base)
    b = timed(h_opt)
    print(f"rep {r}: base {a:,.0f}/s  opt {b:,.0f}/s  ratio {b / a:.3f}",
          flush=True)
