"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from lurk_tpu.curves.weierstrass import PALLAS
from lurk_tpu.fields import PALLAS_SCALAR
from lurk_tpu.ops import limbs as L
from lurk_tpu.parallel.sharding import (
    default_mesh, shard_hash_batch, shard_msm,
)
from lurk_tpu.poseidon.host import hash_preimage


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_nib12_hasher_matches_host():
    """The FLAGSHIP pallas_nib12 hasher shard_mapped over the mesh
    (each device runs its own pallas_call on its local batch slice) —
    digests must equal the host Poseidon."""
    import random
    import jax.numpy as jnp
    from lurk_tpu.ops import nibbles as NB
    from lurk_tpu.parallel.sharding import default_mesh
    mesh = default_mesh(8)
    r = random.Random(21)
    p = PALLAS_SCALAR.modulus
    arity, batch = 4, 64 * 8
    vals = [[r.randrange(p) for _ in range(arity)] for _ in range(batch)]
    pre = np.zeros((arity, 16, batch), dtype=np.uint32)
    for j, pv in enumerate(vals):
        for a, v in enumerate(pv):
            pre[a, :, j] = NB._int_to_limbs(v, 16)
    out = np.asarray(shard_hash_batch(mesh, PALLAS_SCALAR, arity,
                                      jnp.asarray(pre), kernel="nib12"))
    for j in (0, 1, batch // 2, batch - 1):
        got = 0
        for i in range(15, -1, -1):
            got = (got << 16) | int(out[i, j])
        assert got == hash_preimage(PALLAS_SCALAR, vals[j])


def test_sharded_mont_mul_matches_host():
    """Data-parallel sharding mechanics on a cheap kernel."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = default_mesh(8)
    f = L.limb_field(PALLAS_SCALAR)
    import random
    r = random.Random(5)
    xs = [r.randrange(f.modulus) for _ in range(16)]
    ys = [r.randrange(f.modulus) for _ in range(16)]
    a = jax.device_put(np.asarray(f.from_ints(xs)),
                       NamedSharding(mesh, P(None, "dp")))
    b = jax.device_put(np.asarray(f.from_ints(ys)),
                       NamedSharding(mesh, P(None, "dp")))
    out = jax.jit(lambda a, b: L.mont_mul_arr(f, a, b),
                  out_shardings=NamedSharding(mesh, P(None, "dp")))(a, b)
    rinv = pow(1 << L.R_BITS, -1, f.modulus)
    got = f.to_ints(np.asarray(out)[None])
    assert got == [x * y * rinv % f.modulus for x, y in zip(xs, ys)]


def test_sharded_msm_matches_host():
    """Runs in a SUBPROCESS: by this point in the suite the parent has
    accumulated enough LLVM-JIT'd CPU executables that loading the v2
    MSM kernel's (large) compiled artifact segfaults XLA:CPU with
    code-memory exhaustion. A fresh interpreter reproduces the real
    standalone behavior (and still exercises the shared compile
    cache)."""
    import os
    import subprocess
    import sys
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    code = (
        "import random\n"
        "from lurk_tpu.curves.weierstrass import PALLAS\n"
        "from lurk_tpu.parallel.sharding import default_mesh, shard_msm\n"
        "rng = random.Random(3)\n"
        "mesh = default_mesh(8)\n"
        "n = 48\n"
        "pts = [PALLAS.mul(rng.randrange(1, 1 << 60), PALLAS.generator)"
        " for _ in range(n)]\n"
        "scalars = [rng.randrange(PALLAS.order) for _ in range(n)]\n"
        "got = shard_msm(mesh, PALLAS, scalars, pts, c=8, lanes_w=8)\n"
        "assert got == PALLAS.msm(scalars, pts)\n"
        "print('SHARD_MSM_OK')\n")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1200)
    assert "SHARD_MSM_OK" in r.stdout, r.stderr[-2000:]


def test_mesh_prover_real_lurk_fold():
    """THE REAL PROVER PATH ON THE MESH (SURVEY §2.4): with
    LURK_TPU_MESH active, hydration waves ride shard_hash_batch and
    primary-curve commits ride the sharded MSM
    (CommitmentKey._mesh_table) while folding one rc=1 Nova-cycle step
    of the ACTUAL augmented Lurk step circuit. Pins: proof verifies,
    proven output state matches the evaluation, and a mesh commit is
    bit-identical to the host Pippenger oracle.

    Runs in a SUBPROCESS: XLA:CPU fits one mesh-MSM executable per
    process and loading one late in the (JIT-heavy) suite process
    segfaults (CLAUDE.md). Cold machines: run
    scripts/prewarm_cpu_kernels.py first."""
    import os
    import subprocess
    import sys
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["LURK_TPU_MESH"] = "8"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    code = (
        "import random\n"
        "from lurk_tpu.fields import PALLAS_SCALAR\n"
        "from lurk_tpu.lem import evaluate\n"
        "from lurk_tpu.parser import read_with_default_state\n"
        "from lurk_tpu.proof.prover_cycle import CycleNovaProver\n"
        "from lurk_tpu.store.core import Store\n"
        "store = Store(PALLAS_SCALAR)\n"
        "expr = read_with_default_state(store, '(+ 1 2)')\n"
        "frames = evaluate(None, expr, store, 100)\n"
        "prover = CycleNovaProver(rc=1)\n"
        "pp, proof = prover.prove_from_frames(store, frames[:1])\n"
        "assert CycleNovaProver.verify(pp, proof)\n"
        "out = store.hash_ptr(frames[0].output[0])\n"
        "assert proof.zn[0] == out.tag and proof.zn[1] == out.digest\n"
        "r = random.Random(17)\n"
        "vec = [r.randrange(pp.curve1.order) for _ in range(4096)]\n"
        "got = pp.ck1.commit(vec)\n"
        "want = pp.curve1.pippenger(vec, pp.ck1.gens[:4096])\n"
        "assert got == want, 'mesh commit != host pippenger'\n"
        "print('MESH_FOLD_OK')\n")
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=3000)
    assert "MESH_FOLD_OK" in res.stdout, res.stderr[-2000:]
