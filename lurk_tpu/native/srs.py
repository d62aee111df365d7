"""ctypes wrapper for native powers-of-tau SRS generation (srs.cpp).

Oracle: proof/hyperkzg.py::_fixed_base_mul over the python curve — the
cold-cache 2^21 dev SRS costs ~50 min there vs ~15 s here (threaded
window adds + batch inversion). Bit-exact (srs_powers asserts nothing
itself; tests/test_hyperkzg.py exercises openings over these points and
callers cross-check a python-derived prefix)."""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

from . import load

_R = 1 << 256


def available() -> bool:
    return load("srs") is not None


def _to_limbs(v: int) -> np.ndarray:
    return np.asarray([(v >> (64 * i)) & 0xFFFFFFFFFFFFFFFF
                       for i in range(4)], dtype=np.uint64)


def srs_powers(curve, tau: int, start: int, n: int
               ) -> Optional[List[Tuple[int, int]]]:
    """[(x, y)] affine canonical for tau^i * G, i in [start, start+n)."""
    lib = load("srs")
    if lib is None:
        return None
    if n <= 0:
        return []
    bmod = _to_limbs(curve.p)
    br2 = _to_limbs((_R * _R) % curve.p)
    omod = _to_limbs(curve.order)
    or2 = _to_limbs((_R * _R) % curve.order)
    gx, gy = curve.generator
    gen = np.concatenate([_to_limbs(gx), _to_limbs(gy)])
    tau_l = _to_limbs(tau % curve.order)
    out = np.zeros((n, 8), dtype=np.uint64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.lurk_srs_powers(
        bmod.ctypes.data_as(u64p), br2.ctypes.data_as(u64p),
        omod.ctypes.data_as(u64p), or2.ctypes.data_as(u64p),
        gen.ctypes.data_as(u64p), tau_l.ctypes.data_as(u64p),
        ctypes.c_uint64(start), ctypes.c_uint64(n),
        out.ctypes.data_as(u64p),
        ctypes.c_int(min(32, os.cpu_count() or 1)))

    def un(limbs) -> int:
        return sum(int(v) << (64 * i) for i, v in enumerate(limbs))

    return [(un(out[j, :4]), un(out[j, 4:])) for j in range(n)]
