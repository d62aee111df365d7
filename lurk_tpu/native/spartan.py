"""ctypes bindings for the native Spartan sumcheck kernels
(spartan.cpp) + the CSR helpers registered in r1cs.cpp.

Used by proof/spartan.py when available; the pure-python mle.py path
stays as the bit-exact oracle (pinned by tests/test_spartan_native.py).
"""

from __future__ import annotations

import ctypes
from typing import Callable, List, Sequence, Tuple

import numpy as np

from . import load
from .r1cs import _R, _limbs, _pack_vec, _u64p, _unpack_vec, handle_for


def available() -> bool:
    return load("spartan") is not None and load("r1cs") is not None


def _threads() -> int:
    import os
    return min(32, os.cpu_count() or 1)


def _mod_r2(p: int):
    mod = np.frombuffer(_limbs(p), dtype=np.uint64)
    r2 = np.frombuffer(_limbs((_R * _R) % p), dtype=np.uint64)
    return mod, r2


def to_mont(vec, p: int) -> np.ndarray:
    from .r1cs import _as_packed
    lib = load("spartan")
    mod, r2 = _mod_r2(p)
    arr = _as_packed(vec, p)
    out = np.empty_like(arr)
    lib.lurk_vec_to_mont(_u64p(mod), _u64p(r2),
                         ctypes.c_uint64(len(vec)), _u64p(arr),
                         _u64p(out), _threads())
    return out


def from_mont(arr: np.ndarray, n: int, p: int) -> List[int]:
    lib = load("spartan")
    mod, r2 = _mod_r2(p)
    out = np.empty(4 * n, dtype=np.uint64)
    lib.lurk_vec_from_mont(_u64p(mod), _u64p(r2), ctypes.c_uint64(n),
                           _u64p(arr), _u64p(out), _threads())
    return _unpack_vec(out, n)


def chi_table(rs: Sequence[int], p: int) -> List[int]:
    lib = load("spartan")
    mod, r2 = _mod_r2(p)
    k = len(rs)
    rs_arr = _pack_vec([v % p for v in rs], p)
    out = np.empty(4 << k, dtype=np.uint64)
    lib.lurk_chi_table(_u64p(mod), _u64p(r2), ctypes.c_uint64(k),
                       _u64p(rs_arr), _u64p(out), _threads())
    return _unpack_vec(out, 1 << k)


def sumcheck1(eq: Sequence[int], az: Sequence[int], bz: Sequence[int],
              cz: Sequence[int], e: Sequence[int], u: int, p: int,
              challenge: Callable[[Sequence[int]], int]
              ) -> Tuple[List[List[int]], List[int], List[int]]:
    """Native degree-3 sumcheck over comb = eq*(az*bz - u*cz - e);
    same contract as mle.sumcheck_prove (round polys, challenges,
    final per-poly values)."""
    lib = load("spartan")
    mod, r2 = _mod_r2(p)
    n = len(eq)
    arrs = [to_mont(v, p) for v in (eq, az, bz, cz, e)]
    u_arr = _pack_vec([u % p], p)
    rounds: List[List[int]] = []
    rs: List[int] = []
    half = n // 2
    evals = np.empty(16, dtype=np.uint64)
    while half >= 1:
        lib.lurk_sc_round1(
            _u64p(mod), _u64p(r2), ctypes.c_uint64(half),
            _u64p(arrs[0]), _u64p(arrs[1]), _u64p(arrs[2]),
            _u64p(arrs[3]), _u64p(arrs[4]), _u64p(u_arr),
            _u64p(evals), _threads())
        ev = _unpack_vec(evals, 4)
        rounds.append(ev)
        r = challenge(ev)
        rs.append(r)
        r_arr = _pack_vec([r % p], p)
        for a in arrs:
            lib.lurk_sc_bind(_u64p(mod), _u64p(r2),
                             ctypes.c_uint64(half), _u64p(a),
                             _u64p(r_arr), _threads())
        half //= 2
    finals = [from_mont(a, 1, p)[0] for a in arrs]
    return rounds, rs, finals


def sumcheck2(mv: Sequence[int], z: Sequence[int], p: int,
              challenge: Callable[[Sequence[int]], int]
              ) -> Tuple[List[List[int]], List[int], List[int]]:
    """Native degree-2 sumcheck over comb = m*z."""
    lib = load("spartan")
    mod, r2 = _mod_r2(p)
    n = len(mv)
    arrs = [to_mont(mv, p), to_mont(z, p)]
    rounds: List[List[int]] = []
    rs: List[int] = []
    half = n // 2
    evals = np.empty(12, dtype=np.uint64)
    while half >= 1:
        lib.lurk_sc_round2(
            _u64p(mod), _u64p(r2), ctypes.c_uint64(half),
            _u64p(arrs[0]), _u64p(arrs[1]), _u64p(evals), _threads())
        ev = _unpack_vec(evals, 3)
        rounds.append(ev)
        r = challenge(ev)
        rs.append(r)
        r_arr = _pack_vec([r % p], p)
        for a in arrs:
            lib.lurk_sc_bind(_u64p(mod), _u64p(r2),
                             ctypes.c_uint64(half), _u64p(a),
                             _u64p(r_arr), _threads())
        half //= 2
    finals = [from_mont(a, 1, p)[0] for a in arrs]
    return rounds, rs, finals


def spartan_mvec(shape, chi_rx: Sequence[int], r: int,
                 n_half: int) -> List[int]:
    """(A + r B + r^2 C)^T chi over the split-z domain (r1cs.cpp)."""
    lib = load("r1cs")
    h = handle_for(shape)
    chi_arr = _pack_vec([v % shape.p for v in chi_rx], shape.p)
    r_arr = _pack_vec([r % shape.p], shape.p)
    out = np.empty(8 * n_half, dtype=np.uint64)
    lib.lurk_spartan_mvec(ctypes.c_long(h), _u64p(chi_arr),
                          _u64p(r_arr), ctypes.c_uint64(n_half),
                          ctypes.c_uint64(shape.num_inputs), _u64p(out))
    return _unpack_vec(out, 2 * n_half)


def matrix_evals(shape, chi_rx: Sequence[int], chi_ry: Sequence[int],
                 n_half: int) -> Tuple[int, int, int]:
    lib = load("r1cs")
    h = handle_for(shape)
    rx_arr = _pack_vec([v % shape.p for v in chi_rx], shape.p)
    ry_arr = _pack_vec([v % shape.p for v in chi_ry], shape.p)
    out = np.empty(12, dtype=np.uint64)
    lib.lurk_spartan_matrix_evals(
        ctypes.c_long(h), _u64p(rx_arr), _u64p(ry_arr),
        ctypes.c_uint64(n_half), ctypes.c_uint64(shape.num_inputs),
        _u64p(out))
    vals = _unpack_vec(out, 3)
    return vals[0], vals[1], vals[2]


def mle_eval(vec: Sequence[int], rs: Sequence[int], p: int) -> int:
    """Native MLE evaluation (bind_top chain)."""
    lib = load("spartan")
    mod, r2 = _mod_r2(p)
    arr = to_mont(vec, p)
    half = len(vec) // 2
    for r in rs:
        r_arr = _pack_vec([r % p], p)
        lib.lurk_sc_bind(_u64p(mod), _u64p(r2), ctypes.c_uint64(half),
                         _u64p(arr), _u64p(r_arr), _threads())
        half //= 2
    return from_mont(arr, 1, p)[0]


def bind_eo(pv, x: int):
    """In-place Gemini even/odd fold of a plain PackedVec: keeps the
    HyperKZG poly chain native-resident. Returns the halved view."""
    from .r1cs import PackedVec
    lib = load("spartan")
    mod, r2 = _mod_r2(pv.p)
    half = pv.n // 2
    x_arr = _pack_vec([x % pv.p], pv.p)
    lib.lurk_bind_eo(_u64p(mod), _u64p(r2), ctypes.c_uint64(half),
                     _u64p(pv.arr), _u64p(x_arr), _threads())
    return PackedVec(pv.arr[:4 * half].copy(), half, pv.p)


def poly_eval(pv, z: int) -> int:
    lib = load("spartan")
    mod, r2 = _mod_r2(pv.p)
    z_arr = _pack_vec([z % pv.p], pv.p)
    out = np.empty(4, dtype=np.uint64)
    lib.lurk_poly_eval(_u64p(mod), _u64p(r2), ctypes.c_uint64(pv.n),
                       _u64p(pv.arr), _u64p(z_arr), _u64p(out))
    return _unpack_vec(out, 1)[0]


def poly_quotient(pv, z: int):
    from .r1cs import PackedVec
    lib = load("spartan")
    mod, r2 = _mod_r2(pv.p)
    z_arr = _pack_vec([z % pv.p], pv.p)
    out = np.zeros(4 * (pv.n - 1), dtype=np.uint64)
    lib.lurk_poly_quotient(_u64p(mod), _u64p(r2),
                           ctypes.c_uint64(pv.n), _u64p(pv.arr),
                           _u64p(z_arr), _u64p(out))
    return PackedVec(out, pv.n - 1, pv.p)
