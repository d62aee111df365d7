"""ctypes wrapper for the native Poseidon witness-trace generator.

Oracle: lurk_tpu.poseidon.circuit.witness_trace_and_digest (pure
Python)."""

from __future__ import annotations

import ctypes
from typing import Dict, List, Sequence, Tuple

import numpy as np

from . import load

_R = 1 << 256
_HANDLES: Dict[Tuple[str, int], Tuple[int, int]] = {}


def available() -> bool:
    return load("poseidon") is not None


def _limbs(v: int) -> bytes:
    return v.to_bytes(32, "little")


def _u64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _handle(field, arity: int) -> Tuple[int, int]:
    key = (field.name, arity)
    h = _HANDLES.get(key)
    if h is not None:
        return h
    from ..poseidon.spec import poseidon_spec
    spec = poseidon_spec(field, arity)
    lib = load("poseidon")
    lib.lurk_poseidon_new.restype = ctypes.c_long
    p = field.modulus
    mod = np.frombuffer(_limbs(p), dtype=np.uint64)
    r2 = np.frombuffer(_limbs((_R * _R) % p), dtype=np.uint64)
    rc = np.frombuffer(b"".join(_limbs(c % p)
                                for c in spec.round_constants),
                       dtype=np.uint64)
    mds = np.frombuffer(b"".join(_limbs(spec.mds[i][j] % p)
                                 for i in range(spec.width)
                                 for j in range(spec.width)),
                        dtype=np.uint64)
    hd = lib.lurk_poseidon_new(
        _u64p(mod), _u64p(r2), ctypes.c_int(spec.width),
        ctypes.c_int(spec.full_rounds), ctypes.c_int(spec.partial_rounds),
        _u64p(rc), _u64p(mds))
    n_sboxes = spec.width * spec.full_rounds + spec.partial_rounds
    _HANDLES[key] = (hd, n_sboxes)
    return hd, n_sboxes


def hash_batch(field, arity: int, pres: Sequence[Sequence[int]]
               ) -> List[int]:
    """Digest-only batched hashing (store hydration waves on hosts
    where the XLA CPU compile is impractical)."""
    from ..poseidon.spec import poseidon_spec
    hd, _ = _handle(field, arity)
    spec = poseidon_spec(field, arity)
    p = field.modulus
    tag = _limbs(spec.domain_tag)
    buf = b"".join(
        tag + b"".join(_limbs(x % p) for x in pre) for pre in pres)
    states = np.frombuffer(buf, dtype=np.uint64)
    out = np.zeros(len(pres) * 4, dtype=np.uint64)
    lib = load("poseidon")
    lib.lurk_poseidon_hash_many(ctypes.c_long(hd), _u64p(states),
                                ctypes.c_uint64(len(pres)), _u64p(out))
    by = out.tobytes()
    return [int.from_bytes(by[32 * i:32 * (i + 1)], "little")
            for i in range(len(pres))]


def witness_trace_and_digest(field, preimage: Sequence[int]
                             ) -> Tuple[List[int], int]:
    """Native counterpart of circuit.witness_trace_and_digest."""
    from ..poseidon.spec import poseidon_spec
    arity = len(preimage)
    hd, n_sboxes = _handle(field, arity)
    spec = poseidon_spec(field, arity)
    p = field.modulus
    state0 = np.frombuffer(
        _limbs(spec.domain_tag)
        + b"".join(_limbs(x % p) for x in preimage), dtype=np.uint64)
    out_tr = np.zeros(n_sboxes * 3 * 4, dtype=np.uint64)
    out_dg = np.zeros(4, dtype=np.uint64)
    lib = load("poseidon")
    lib.lurk_poseidon_trace(ctypes.c_long(hd), _u64p(state0),
                            _u64p(out_tr), _u64p(out_dg))
    by = out_tr.tobytes()
    trace = [int.from_bytes(by[32 * i:32 * (i + 1)], "little")
             for i in range(n_sboxes * 3)]
    digest = int.from_bytes(out_dg.tobytes(), "little")
    return trace, digest
