"""ctypes wrapper for native Pedersen generator derivation (pedersen.cpp).

Oracle: lurk_tpu.curves.weierstrass.Curve.derive_generators_from (pure
Python shake256 try-and-increment); bit-exact, threaded. This is the
prover's dominant COLD-start cost (one fib proof's commitment key needs
~590k curve points — ~350s of python Tonelli-Shanks, ~1-2s here)."""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

from . import load

_R = 1 << 256


def available() -> bool:
    return load("pedersen") is not None


def _to_limbs(v: int) -> np.ndarray:
    return np.asarray([(v >> (64 * i)) & 0xFFFFFFFFFFFFFFFF
                       for i in range(4)], dtype=np.uint64)


def derive_generators_from(curve, label: bytes, start: int, end: int
                           ) -> Optional[List]:
    """[(x, y)] for indices [start, end); None if native unavailable."""
    lib = load("pedersen")
    if lib is None:
        return None
    n = end - start
    if n <= 0:
        return []
    mod = _to_limbs(curve.p)
    r2 = _to_limbs((_R * _R) % curve.p)
    b = _to_limbs(curve.b % curve.p)
    lab = np.frombuffer(label, dtype=np.uint8) if label else \
        np.zeros(0, dtype=np.uint8)
    out = np.zeros((n, 8), dtype=np.uint64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.derive_generators(
        mod.ctypes.data_as(u64p), r2.ctypes.data_as(u64p),
        b.ctypes.data_as(u64p),
        lab.ctypes.data_as(u8p), ctypes.c_int64(len(label)),
        ctypes.c_int64(start), ctypes.c_int64(end),
        out.ctypes.data_as(u64p),
        ctypes.c_int(min(32, os.cpu_count() or 1)))
    if rc != 0:
        return None

    def un(limbs) -> int:
        return sum(int(v) << (64 * i) for i, v in enumerate(limbs))

    return [(un(out[j, :4]), un(out[j, 4:])) for j in range(n)]
