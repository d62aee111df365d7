"""Multi-chip data parallelism over a jax.sharding.Mesh.

The reference parallelizes with rayon inside one process (SURVEY.md
§2.4); the TPU-native analog shards the prover's batched workloads —
Poseidon hydration waves, MSM point sets, witness batches — across a
device mesh, with partial results combined via collectives or a log-depth
on-device tree.

Design (scaling-book recipe): one 1-D "dp" mesh axis; batch-axis
sharding annotations; XLA inserts the all-gathers. The MSM combine is a
tiny EC tree-add over n_devices partial sums (ICI traffic = O(devices)
points, negligible vs the sharded bucket work).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curves.weierstrass import Affine, Curve
from ..fields import FieldSpec


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=("dp",))


class _no_cache_writes:
    """Persistent-compilation-cache WRITES of the mesh MSM kernel from
    a long-lived prover process segfault XLA:CPU (observed twice at
    compilation_cache.put_executable_and_time after heavy prior JIT
    activity). Reads stay enabled — scripts/prewarm_cpu_kernels.py
    populates the cache from a fresh process, where writes are safe."""

    def __enter__(self):
        import os
        if jax.default_backend() != "cpu" or \
                os.environ.get("LURK_TPU_ALLOW_CACHE_WRITE"):
            self._prev = None
            return
        self._prev = jax.config.jax_persistent_cache_min_compile_time_secs
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1e9)

    def __exit__(self, *exc):
        if self._prev is not None:
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", self._prev)


class _no_compile_cache:
    """BIG (per > 64) mesh-MSM executables cannot ride the persistent
    cache on XLA:CPU at all: deserializing them segfaults in
    compilation_cache.get_executable_and_time even in a fresh process
    (and serializing them segfaults too). Disable the cache around
    their dispatch — each process compiles once in memory (~60-150 s)
    and reuses the in-memory executable thereafter."""

    def __enter__(self):
        if jax.default_backend() != "cpu":
            self._prev = None
            return
        self._prev = jax.config.jax_enable_compilation_cache
        jax.config.update("jax_enable_compilation_cache", False)

    def __exit__(self, *exc):
        if self._prev is not None:
            jax.config.update("jax_enable_compilation_cache",
                              self._prev)


_CPU_MSM_CLAIM: Optional[str] = None


def claim_cpu_msm_slot(curve_name: str) -> bool:
    """XLA:CPU can host exactly ONE mesh-MSM executable per process:
    compiling OR cache-loading a second one segfaults/aborts (LLVM
    section memory; serializer crashes — all observed r5). The first
    curve claims the slot; other curves' commits fall back to the
    native host path. Real accelerator meshes are unaffected."""
    global _CPU_MSM_CLAIM
    if jax.default_backend() != "cpu":
        return True
    if _CPU_MSM_CLAIM is None or _CPU_MSM_CLAIM == curve_name:
        _CPU_MSM_CLAIM = curve_name
        return True
    return False


_PROVER_MESH: object = "unset"


def prover_mesh() -> Optional[Mesh]:
    """The mesh the PROVER shards over (hydration waves, witness/cross-
    term commits) — the rayon-pool analog of the reference's in-process
    parallel prover (store_core.rs:256-269 hydration, nova.rs:297-332
    witgen-parallel folding), mapped to devices per SURVEY §2.4.

    Enabled when >1 accelerator device is attached, or explicitly via
    LURK_TPU_MESH=1 (any device set, incl. the virtual CPU mesh — how
    tests and the multichip dryrun exercise the real prover sharding).
    LURK_TPU_MESH=0 forces single-device paths. Cached after first call.
    """
    global _PROVER_MESH
    if _PROVER_MESH != "unset":
        return _PROVER_MESH
    import os
    flag = os.environ.get("LURK_TPU_MESH", "")
    mesh: Optional[Mesh] = None
    try:
        devs = jax.devices()
        if flag == "0":
            mesh = None
        elif flag:
            n = int(flag) if flag.isdigit() and int(flag) > 1 \
                else len(devs)
            n = min(n, len(devs))
            mesh = default_mesh(n) if n > 1 else None
        elif len(devs) > 1 and jax.default_backend() != "cpu":
            mesh = default_mesh(len(devs))
    except Exception:
        mesh = None
    _PROVER_MESH = mesh
    return mesh


# ---------------------------------------------------------------------------
# sharded Poseidon hydration
# ---------------------------------------------------------------------------


def shard_hash_batch(mesh: Mesh, field: FieldSpec, arity: int,
                     preimages: jnp.ndarray,
                     kernel: str = "xla") -> jnp.ndarray:
    """Data-parallel batched Poseidon: preimages uint32[arity, NL, B]
    sharded on the batch axis; pure data parallel (no collectives).

    kernel="nib12" runs the FLAGSHIP 6th-gen pallas kernel per shard
    via shard_map (each device executes its own pallas_call on its
    local batch slice — the production hydration sharding); "xla" keeps
    the 1st-gen jnp kernel (cheap SPMD compile for smoke tests)."""
    if kernel == "nib12":
        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map
        from ..poseidon.pallas_nib12 import build_pallas_nib12_hasher
        n_dev = mesh.devices.size
        batch = preimages.shape[-1]
        assert batch % n_dev == 0
        tile = min(2048, batch // n_dev)
        hasher = build_pallas_nib12_hasher(field, arity, tile=tile)
        try:
            fn = shard_map(hasher, mesh=mesh,
                           in_specs=P(None, None, "dp"),
                           out_specs=P(None, "dp"), check_vma=False)
        except TypeError:            # older jax spells it check_rep
            fn = shard_map(hasher, mesh=mesh,
                           in_specs=P(None, None, "dp"),
                           out_specs=P(None, "dp"), check_rep=False)
        x = jax.device_put(
            preimages, NamedSharding(mesh, P(None, None, "dp")))
        return jax.jit(fn)(x)
    from ..poseidon.kernel import build_hasher
    hasher = build_hasher(field, arity)
    in_sh = NamedSharding(mesh, P(None, None, "dp"))
    out_sh = NamedSharding(mesh, P(None, "dp"))
    x = jax.device_put(preimages, in_sh)
    return jax.jit(hasher, out_shardings=out_sh)(x)


def shard_hash_batch_ints(mesh: Mesh, field: FieldSpec, arity: int,
                          preimages_ints,
                          kernel: Optional[str] = None) -> list:
    """Host API for mesh hydration (ints in, digests out): pads the
    batch to a shared power-of-two bucket per device (compile reuse),
    packs to 16-bit limb columns, runs :func:`shard_hash_batch`, and
    unpacks. The prover's `store.hydrate_z_cache` wave path routes here
    when :func:`prover_mesh` is active (store_core.rs:256-269 analog).
    """
    from ..ops import nibbles as NB
    n = len(preimages_ints)
    n_dev = mesh.devices.size
    per = 64
    while per * n_dev < n:
        per *= 2
    size = per * n_dev
    if kernel is None:
        # the flagship pallas kernel per shard everywhere: on the
        # virtual CPU mesh it runs in interpret mode, which is only
        # viable for small shards (the jnp kernel's XLA:CPU compile is
        # pathological — 20+ GB RSS — so it is NOT a fallback here;
        # callers gate big CPU waves to the native host path instead)
        kernel = "nib12"
    p = field.modulus
    arr = np.zeros((arity, 16, size), dtype=np.uint32)
    for j, pre in enumerate(preimages_ints):
        for a, v in enumerate(pre):
            arr[a, :, j] = NB._int_to_limbs(v % p, 16)
    out = np.asarray(shard_hash_batch(mesh, field, arity,
                                      jnp.asarray(arr), kernel=kernel))
    res = []
    for j in range(n):
        v = 0
        for i in range(15, -1, -1):
            v = (v << 16) | int(out[i, j])
        res.append(v)
    return res


# ---------------------------------------------------------------------------
# sharded MSM
# ---------------------------------------------------------------------------


class ShardedMsmTable:
    """Device-resident point shards for a long-lived base set (Pedersen
    generators / SRS powers): each device owns a contiguous shard and
    runs the full v2 Pippenger pipeline on its slice; the n_dev partial
    [1, 66] projective rows combine host-side (n_dev - 1 complete adds
    — negligible vs the sharded bucket work). All shards share ONE
    compiled executable (same shapes). Upload happens once; the
    prover's per-step commits reuse the resident shards (SURVEY §2.4
    MSM row — the flagship multi-host kernel inside the prover)."""

    def __init__(self, mesh: Mesh, curve: Curve,
                 points: Sequence[Affine]):
        from ..msm.device_v2 import MsmTable
        self.mesh = mesh
        self.curve = curve
        self.n = len(points)
        n_dev = mesh.devices.size
        per = 64
        while per * n_dev < self.n:
            per *= 2
        # On the virtual CPU mesh, cap the per-chunk size at 64 and
        # loop chunks per device. Only the per=64 config is SAFE on
        # XLA:CPU: bigger configs segfault the persistent-cache
        # serializer AND deserializer, and a second big in-process
        # compile dies with "LLVM ERROR: Unable to allocate section
        # memory" (all observed r5). per=64 entries cache and load
        # cleanly, so both cycle curves can ride the mesh in one
        # process.
        cap = 64 if jax.default_backend() == "cpu" else 1 << 30
        self.per = min(per, cap)
        self.chunks_per_dev = per // self.per
        pts = list(points) + [None] * (per * n_dev - self.n)
        devices = list(mesh.devices.flat)
        self.shards = []          # [(device_idx, rows)] chunk-major
        for d in range(n_dev):
            for k in range(self.chunks_per_dev):
                lo = (d * self.chunks_per_dev + k) * self.per
                tab = MsmTable.build(curve, pts[lo:lo + self.per])
                self.shards.append(
                    (d, jax.device_put(tab.rows, devices[d])))

    def msm(self, scalars: Sequence[int], c: int = 8,
            lanes_w: int = 512) -> Affine:
        from ..msm import ec12 as E12
        from ..msm.device_v2 import (
            _jit_kernel, _unflat, pack_scalar_words,
        )
        n_dev = self.mesh.devices.size
        per = self.per
        total = per * self.chunks_per_dev * n_dev
        assert len(scalars) <= self.n
        scalars = list(scalars) + [0] * (total - len(scalars))
        words = pack_scalar_words(scalars, self.curve.order)
        lanes_w = min(lanes_w, max(1, per // 2))
        cpu = jax.default_backend() == "cpu"
        # CPU chunks are tiny (per=64): return per-window sums and run
        # the doubling ladder ONCE host-side across all chunks (the
        # in-kernel 248-serial-add ladder dominated per-chunk runtime)
        fn = _jit_kernel(self.curve, lanes_w, c,
                         combine_windows=not cpu)
        devices = list(self.mesh.devices.flat)
        outs = []
        guard = _no_compile_cache() if per > 64 else _no_cache_writes()
        with guard:
            for i, (d, rows) in enumerate(self.shards):
                w = jax.device_put(
                    jnp.asarray(words[i * per:(i + 1) * per]),
                    devices[d])
                outs.append(fn(rows, w))         # dispatches on device d
        if not cpu:
            acc = None
            for out in outs:
                for p in E12.pt_from_device(self.curve,
                                            _unflat(self.curve, out)):
                    acc = self.curve.add(acc, p)
            return acc
        from ..msm.device_v2 import _cfg
        n_win = _cfg(c)[0]
        win_sums = [None] * n_win
        for out in outs:
            pts = E12.pt_from_device(self.curve,
                                     _unflat(self.curve, out))
            for wi in range(n_win):
                win_sums[wi] = self.curve.add(win_sums[wi], pts[wi])
        acc = None
        for wi in reversed(range(n_win)):
            if acc is not None:
                for _ in range(c):
                    acc = self.curve.add(acc, acc)
            acc = self.curve.add(acc, win_sums[wi])
        return acc


def shard_msm(mesh: Mesh, curve: Curve, scalars: Sequence[int],
              points: Sequence[Affine], c: int = 8,
              lanes_w: int = 512) -> Affine:
    """One-shot sharded MSM (table built per call — prefer
    :class:`ShardedMsmTable` for long-lived bases)."""
    n = len(scalars)
    tab = ShardedMsmTable(mesh, curve, list(points)[:n])
    return tab.msm(list(scalars), c=c, lanes_w=lanes_w)
