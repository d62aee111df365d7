"""ctypes wrapper for the native Pippenger MSM (msm.cpp).

Oracle: lurk_tpu.curves.weierstrass.Curve.pippenger (pure Python).
"""

from __future__ import annotations

import ctypes
import math
import os
from typing import List, Optional, Sequence

import numpy as np

from ..curves.weierstrass import Affine, Curve
from . import load

_R = 1 << 256


def available() -> bool:
    return load("msm") is not None


def _to_limbs(v: int) -> List[int]:
    return [(v >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(4)]


def _pack_scalars(scalars: Sequence[int], order: int) -> np.ndarray:
    from .r1cs import _pack_vec
    return _pack_vec(scalars, order).reshape(len(scalars), 4)


def pack_points(points: Sequence[Affine]) -> np.ndarray:
    """[n, 8] uint64 canonical (x, y) limb array; cacheable (commitment
    keys pack their generators once). Bulk C packing via fastpack (the
    per-point to_bytes/join path cost ~30s at 2M-point keys)."""
    from .fastpack import pack_ints
    n = len(points)
    try:
        xs = [0 if pt is None else pt[0] for pt in points]
        ys = [0 if pt is None else pt[1] for pt in points]
        bx = np.frombuffer(pack_ints(xs), dtype=np.uint64).reshape(n, 4)
        by = np.frombuffer(pack_ints(ys), dtype=np.uint64).reshape(n, 4)
        out = np.empty((n, 8), dtype=np.uint64)
        out[:, :4] = bx
        out[:, 4:] = by
        return out
    except Exception:
        buf = b"".join(
            (pt[0].to_bytes(32, "little") + pt[1].to_bytes(32, "little"))
            if pt is not None else bytes(64)
            for pt in points)
        return np.frombuffer(buf, dtype=np.uint64).reshape(n, 8)


def _default_c(n: int) -> int:
    if n < 32:
        return 3
    if _algo() == 1:
        # batch-affine accumulation is cheaper per point than serial
        # mixed adds, which shifts the optimal window down: bucket
        # reduction (2*2^c Jacobian adds/window) caps c sooner.
        # Measured (scripts/bench_msm_ab.py): best c = 11/13/15 at
        # 2^16/2^18/2^20.
        return min(16, max(4, int(math.log2(n)) - 5))
    return min(16, max(4, int(math.log2(n)) - 2))


def _algo() -> int:
    """0 = sequential mixed adds (default), 1 = batch affine.

    Batch affine wins ~1.2x on standalone benchmarks (uniform AND
    witness-skewed scalar mixes, scripts/bench_msm_ab.py), but the
    END-TO-END fib prove regressed 89s -> 222s with it as default —
    unreproduced standalone; suspicion is interaction with the
    witness-gen∥fold pipeline's memory traffic (the batch path
    allocates/touches ~60MB of sorted coordinate arrays per window
    per call). Until that's profiled inside the prover, the serial
    path stays the default; set LURK_MSM_ALGO=1 to opt in."""
    return int(os.environ.get("LURK_MSM_ALGO", "0"))


def msm(curve: Curve, scalars: Sequence[int], points: Sequence[Affine],
        c: Optional[int] = None, n_threads: Optional[int] = None,
        algo: Optional[int] = None) -> Affine:
    """Native Pippenger MSM; bit-exact vs Curve.pippenger."""
    return msm_packed(curve, scalars, pack_points(points), c, n_threads,
                      algo)


def msm_packed(curve: Curve, scalars: Sequence[int], packed: np.ndarray,
               c: Optional[int] = None, n_threads: Optional[int] = None,
               algo: Optional[int] = None) -> Affine:
    lib = load("msm")
    assert lib is not None, "native msm unavailable"
    n = len(scalars)
    assert n <= packed.shape[0]
    if n == 0:
        return None
    if algo is None:
        algo = _algo()
    if c is None:
        if n < 32:
            c = 3
        elif algo == 1:
            c = min(16, max(4, int(math.log2(n)) - 5))
        else:
            c = min(16, max(4, int(math.log2(n)) - 2))
    if n_threads is None:
        n_threads = min(32, os.cpu_count() or 1)
    mod = np.asarray(_to_limbs(curve.p), dtype=np.uint64)
    r2 = np.asarray(_to_limbs((_R * _R) % curve.p), dtype=np.uint64)
    pts = np.ascontiguousarray(packed[:n])
    from .r1cs import PackedVec
    if isinstance(scalars, PackedVec):
        scs = scalars.arr.reshape(-1, 4)[:n]
    else:
        scs = _pack_scalars(scalars, curve.order)
    out = np.zeros(12, dtype=np.uint64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.lurk_msm_ex(
        mod.ctypes.data_as(u64p), r2.ctypes.data_as(u64p),
        pts.ctypes.data_as(u64p), scs.ctypes.data_as(u64p),
        ctypes.c_size_t(n), ctypes.c_int(c), ctypes.c_int(n_threads),
        ctypes.c_int(curve.scalar.num_bits), ctypes.c_int(algo),
        out.ctypes.data_as(u64p))

    def un(limbs) -> int:
        return sum(int(v) << (64 * i) for i, v in enumerate(limbs))

    x, y, z = un(out[0:4]), un(out[4:8]), un(out[8:12])
    if z == 0:
        return None
    return curve.jac_to_affine((x, y, z))
