"""ctypes wrapper for the native sparse R1CS kernels (r1cs.cpp).

Oracle: lurk_tpu.proof.nova.R1CSShape (pure Python). Shapes register
once per process keyed by their digest; z vectors cross the boundary as
packed 4x64 limb arrays.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import load

_R = 1 << 256
_HANDLES: Dict[Tuple[str, int], int] = {}


def available() -> bool:
    return load("r1cs") is not None


def _limbs(v: int) -> bytes:
    return v.to_bytes(32, "little")


def _pack_vec(vec: Sequence[int], p: int) -> np.ndarray:
    from .fastpack import pack_ints
    try:
        buf = pack_ints(vec)
        arr = np.frombuffer(buf, dtype=np.uint64)
        # canonicality guard: values whose top limb stays strictly
        # below p's are < p; a hit on the boundary bucket (or an
        # out-of-range element above) falls back to an explicit mod.
        if arr.size and int(arr[3::4].max()) >= (p >> 192):
            raise OverflowError
        return arr
    except (OverflowError, ValueError, TypeError):
        buf = pack_ints([int(v) % p for v in vec])
        return np.frombuffer(buf, dtype=np.uint64)


def _unpack_vec(arr: np.ndarray, n: int) -> List[int]:
    from .fastpack import unpack_ints
    return unpack_ints(arr.tobytes()[:32 * n])


class PackedVec:
    """A field vector held as 4x64-limb LE packed numpy (canonical,
    < p). Keeps prover accumulators native-resident: the int-list <->
    bytes marshalling at every fold step was ~20% of warm prove time.
    Iteration/indexing unpack lazily (cached) for the cold paths."""

    __slots__ = ("arr", "n", "p", "_ints")

    def __init__(self, arr: np.ndarray, n: int, p: int):
        self.arr = arr
        self.n = n
        self.p = p
        self._ints = None

    @staticmethod
    def pack(vec, p: int) -> "PackedVec":
        if isinstance(vec, PackedVec):
            return vec
        return PackedVec(_pack_vec(vec, p), len(vec), p)

    def ints(self) -> List[int]:
        if self._ints is None:
            self._ints = _unpack_vec(self.arr, self.n)
        return self._ints

    def __len__(self) -> int:
        return self.n

    def __iter__(self):
        return iter(self.ints())

    def __getitem__(self, i):
        return self.ints()[i]

    def __setitem__(self, i, v):
        vals = self.ints()
        vals[i] = v
        self.arr = _pack_vec(vals, self.p)
        self._ints = vals


def _as_packed(vec, p: int) -> np.ndarray:
    if isinstance(vec, PackedVec):
        return vec.arr
    return _pack_vec(vec, p)


def pv_concat(head: Sequence[int], tail, p: int) -> "PackedVec":
    """PackedVec of (head ints ++ tail vector)."""
    ha = _pack_vec([int(v) % p for v in head], p)
    ta = _as_packed(tail, p)
    n = len(head) + len(tail)
    return PackedVec(np.concatenate([ha, ta]), n, p)


def _u64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _csr(rows, which: int, p: int):
    from .fastpack import pack_ints
    indptr = [0]
    idx: List[int] = []
    coefs: List[int] = []
    for row in rows:
        lc = row[which]
        for v, c in sorted(lc.items()):
            idx.append(v)
            coefs.append(c % p)
        indptr.append(len(idx))
    return (np.asarray(indptr, dtype=np.uint64),
            np.asarray(idx, dtype=np.uint64),
            np.frombuffer(pack_ints(coefs), dtype=np.uint64))


def handle_for(shape) -> int:
    """Register (once) and return the native handle for an
    nova.R1CSShape."""
    key = (shape.digest, shape.p)     # same structure over two fields
    h = _HANDLES.get(key)             # must not share a handle
    if h is not None:
        return h
    lib = load("r1cs")
    lib.lurk_r1cs_shape.restype = ctypes.c_long
    p = shape.p
    mod = np.frombuffer(_limbs(p), dtype=np.uint64)
    r2 = np.frombuffer(_limbs((_R * _R) % p), dtype=np.uint64)
    n_vars = shape.num_inputs + shape.num_aux
    args = [_u64p(mod), _u64p(r2),
            ctypes.c_uint64(shape.num_constraints),
            ctypes.c_uint64(n_vars)]
    keep = []
    pre = getattr(shape, "csr", None)
    for which in range(3):
        if pre is not None:
            indptr, idx, coef = pre[which]
        else:
            indptr, idx, coef = _csr(shape.rows, which, p)
        keep.extend((indptr, idx, coef))
        args.extend((_u64p(indptr), _u64p(idx), _u64p(coef)))
    h = lib.lurk_r1cs_shape(*args)
    _HANDLES[key] = h
    return h


def _threads() -> int:
    return min(32, os.cpu_count() or 1)


def matvecs(shape, z: Sequence[int]):
    lib = load("r1cs")
    h = handle_for(shape)
    m = shape.num_constraints
    zp = _as_packed(z, shape.p)
    out = np.zeros(3 * m * 4, dtype=np.uint64)
    lib.lurk_r1cs_matvecs(ctypes.c_long(h), _u64p(zp),
                          ctypes.c_int(_threads()), _u64p(out))
    az = _unpack_vec(out[:4 * m], m)
    bz = _unpack_vec(out[4 * m:8 * m], m)
    cz = _unpack_vec(out[8 * m:], m)
    return az, bz, cz


def cross_term(shape, z1: Sequence[int], u1: int, z2: Sequence[int]
               ) -> List[int]:
    lib = load("r1cs")
    h = handle_for(shape)
    m = shape.num_constraints
    p = shape.p
    z1p = _as_packed(z1, p)
    z2p = _as_packed(z2, p)
    u1p = np.frombuffer(_limbs(u1 % p), dtype=np.uint64)
    out = np.zeros(m * 4, dtype=np.uint64)
    lib.lurk_r1cs_cross_term(ctypes.c_long(h), _u64p(z1p), _u64p(u1p),
                             _u64p(z2p), ctypes.c_int(_threads()),
                             _u64p(out))
    return _unpack_vec(out, m)


def cross_term_pv(shape, z1, u1: int, z2) -> "PackedVec":
    """cross_term with a packed result (stays native-resident)."""
    lib = load("r1cs")
    h = handle_for(shape)
    m = shape.num_constraints
    p = shape.p
    z1p = _as_packed(z1, p)
    z2p = _as_packed(z2, p)
    u1p = np.frombuffer(_limbs(u1 % p), dtype=np.uint64)
    out = np.zeros(m * 4, dtype=np.uint64)
    lib.lurk_r1cs_cross_term(ctypes.c_long(h), _u64p(z1p), _u64p(u1p),
                             _u64p(z2p), ctypes.c_int(_threads()),
                             _u64p(out))
    return PackedVec(out, m, p)


def check_relaxed(shape, z: Sequence[int], u: int, e: Sequence[int]
                  ) -> bool:
    lib = load("r1cs")
    lib.lurk_r1cs_check_relaxed.restype = ctypes.c_uint64
    h = handle_for(shape)
    p = shape.p
    zp = _as_packed(z, p)
    ep = _as_packed(e, p)
    up = np.frombuffer(_limbs(u % p), dtype=np.uint64)
    bad = lib.lurk_r1cs_check_relaxed(ctypes.c_long(h), _u64p(zp),
                                      _u64p(up), _u64p(ep),
                                      ctypes.c_int(_threads()))
    return bad == 0


def vec_rlc(p: int, a: Sequence[int], b: Sequence[int], r: int
            ) -> List[int]:
    """a + r*b mod p elementwise (the fold's witness/error RLC)."""
    lib = load("r1cs")
    n = len(a)
    assert len(b) == n
    mod = np.frombuffer(_limbs(p), dtype=np.uint64)
    r2 = np.frombuffer(_limbs((_R * _R) % p), dtype=np.uint64)
    ap = _as_packed(a, p)
    bp = _as_packed(b, p)
    rp = np.frombuffer(_limbs(r % p), dtype=np.uint64)
    out = np.zeros(4 * n, dtype=np.uint64)
    lib.lurk_vec_rlc(_u64p(mod), _u64p(r2), _u64p(ap), _u64p(bp),
                     _u64p(rp), ctypes.c_uint64(n),
                     ctypes.c_int(_threads()), _u64p(out))
    return _unpack_vec(out, n)


def vec_rlc_pv(p: int, a, b, r: int) -> "PackedVec":
    """a + r*b with a packed result."""
    lib = load("r1cs")
    n = len(a)
    assert len(b) == n
    mod = np.frombuffer(_limbs(p), dtype=np.uint64)
    r2 = np.frombuffer(_limbs((_R * _R) % p), dtype=np.uint64)
    ap = _as_packed(a, p)
    bp = _as_packed(b, p)
    rp = np.frombuffer(_limbs(r % p), dtype=np.uint64)
    out = np.zeros(4 * n, dtype=np.uint64)
    lib.lurk_vec_rlc(_u64p(mod), _u64p(r2), _u64p(ap), _u64p(bp),
                     _u64p(rp), ctypes.c_uint64(n),
                     ctypes.c_int(_threads()), _u64p(out))
    return PackedVec(out, n, p)


def cross_term_cached(shape, abc1, u1: int, z2):
    """Cross term using cached accumulator matvecs.

    abc1: PackedVec of (Az1 | Bz1 | Cz1) (3m elements). Returns
    (t: PackedVec[m], abc2: PackedVec[3m]) — abc2 lets the caller fold
    the cache forward (abc1' = abc1 + r * abc2, since z folds
    linearly)."""
    lib = load("r1cs")
    h = handle_for(shape)
    m = shape.num_constraints
    p = shape.p
    a1 = _as_packed(abc1, p)
    z2p = _as_packed(z2, p)
    u1p = np.frombuffer(_limbs(u1 % p), dtype=np.uint64)
    out_t = np.zeros(m * 4, dtype=np.uint64)
    out2 = np.zeros(3 * m * 4, dtype=np.uint64)
    lib.lurk_r1cs_cross_term_cached(
        ctypes.c_long(h), _u64p(a1), _u64p(u1p), _u64p(z2p),
        ctypes.c_int(_threads()), _u64p(out_t), _u64p(out2))
    return PackedVec(out_t, m, p), PackedVec(out2, 3 * m, p)


def matvecs_pv(shape, z) -> "PackedVec":
    """(Az | Bz | Cz) as one packed 3m vector (cache initialization
    for cross_term_cached — e.g. after resuming a snark whose
    accumulator is not the zero instance)."""
    lib = load("r1cs")
    h = handle_for(shape)
    m = shape.num_constraints
    zp = _as_packed(z, shape.p)
    out = np.zeros(3 * m * 4, dtype=np.uint64)
    lib.lurk_r1cs_matvecs(ctypes.c_long(h), _u64p(zp),
                          ctypes.c_int(_threads()), _u64p(out))
    return PackedVec(out, 3 * m, shape.p)


def matvecs_padded_pv(shape, z, m_pad: int):
    """(Az, Bz, Cz) as three zero-padded PackedVecs (no int round-trip
    — feeds the native sumcheck directly)."""
    lib = load("r1cs")
    h = handle_for(shape)
    m = shape.num_constraints
    zp = _as_packed(z, shape.p)
    out = np.zeros(3 * m * 4, dtype=np.uint64)
    lib.lurk_r1cs_matvecs(ctypes.c_long(h), _u64p(zp),
                          ctypes.c_int(_threads()), _u64p(out))
    pad = np.zeros(4 * (m_pad - m), dtype=np.uint64)
    return tuple(
        PackedVec(np.concatenate([out[4 * m * k:4 * m * (k + 1)], pad]),
                  m_pad, shape.p)
        for k in range(3))


def pad_pv(vec, n: int, p: int) -> "PackedVec":
    """Zero-pad a vector to length n as a PackedVec."""
    arr = _as_packed(vec, p)
    m = len(vec)
    assert m <= n
    if m == n:
        return PackedVec(arr, n, p)
    return PackedVec(
        np.concatenate([arr, np.zeros(4 * (n - m), dtype=np.uint64)]),
        n, p)
