"""Public-parameter disk cache.

Parity: /root/reference/src/public_parameters/{mod,instance,disk_cache}.rs
— on-disk cache of folding public params keyed by the circuit shape
digest (the reference keys by rc x circuit digest; our shape digest
already covers rc because the MultiFrame circuit bakes it in).

Generators are stored as a raw little-endian uint8 numpy array (the
abomonation-style zero-copy analog); metadata as a JSON sidecar.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..curves.weierstrass import Affine, Curve


def cache_dir() -> Path:
    base = os.environ.get("LURK_TPU_CACHE",
                          os.path.join(os.path.expanduser("~"),
                                       ".lurk_tpu"))
    d = Path(base) / "public_params"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _gens_to_bytes(gens: List[Affine]) -> bytes:
    out = bytearray()
    for pt in gens:
        assert pt is not None
        out += pt[0].to_bytes(32, "little")
        out += pt[1].to_bytes(32, "little")
    return bytes(out)


def _gens_from_bytes(data: bytes, n: int) -> List[Affine]:
    """Bulk path: one C-level unpack of all 2n coordinates (the
    python int.from_bytes loop was a ~100s fixed cost per prover run
    at 2M-point keys)."""
    from ..native import fastpack
    try:
        coords = fastpack.unpack_ints(data[:64 * n])
        it = iter(coords)
        return list(zip(it, it))
    except Exception:
        gens = []
        for i in range(n):
            off = 64 * i
            x = int.from_bytes(data[off:off + 32], "little")
            y = int.from_bytes(data[off + 32:off + 64], "little")
            gens.append((x, y))
        return gens


def load_generators(curve: Curve, label: bytes, n: int) -> List[Affine]:
    """Cached generator derivation; extends the cache file on growth.

    The read-modify-write of the shared cache entry is guarded by an
    fcntl file lock, and both files are written via temp + os.replace so
    a concurrent reader never sees a .bin/.json pair mid-update."""
    import fcntl
    key = f"ck_{curve.name}_{label.hex()}"
    path = cache_dir() / f"{key}.bin"
    meta_path = cache_dir() / f"{key}.json"
    lock_path = cache_dir() / f"{key}.lock"
    with open(lock_path, "w") as lock_f:
        fcntl.flock(lock_f, fcntl.LOCK_EX)
        gens: List[Affine] = []
        if path.exists() and meta_path.exists():
            meta = json.loads(meta_path.read_text())
            have = meta["n"]
            data = path.read_bytes()
            gens = _gens_from_bytes(data, min(have, n))
            if have >= n:
                return gens[:n]
        fresh = curve.derive_generators_from(label, len(gens), n)
        gens = gens + fresh
        _atomic_write(path, _gens_to_bytes(gens))
        _atomic_write(meta_path, json.dumps(
            {"curve": curve.name, "label": label.hex(),
             "n": len(gens)}).encode())
        return gens


def _atomic_write(path: Path, data: bytes) -> None:
    tmp = path.with_suffix(path.suffix + f".tmp.{os.getpid()}")
    tmp.write_bytes(data)
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# R1CS shape disk cache (abomonation-analog zero-ish-copy reload): skips
# the full first-step circuit synthesis on repeat proves.
# ---------------------------------------------------------------------------


def _shape_path(key: str) -> Path:
    return cache_dir() / f"shape-{key}.npz"


def shape_cache_key(field_name: str, rc: int, func) -> str:
    """Content-derived key: the LEM step function's frozen-IR repr is
    deterministic, so (field, rc, IR) pins the circuit."""
    import hashlib
    h = hashlib.sha256()
    h.update(field_name.encode())
    h.update(str(rc).encode())
    h.update(repr(func).encode())
    return h.hexdigest()[:32]


def save_shape(key: str, shape) -> None:
    import io
    m = shape.num_constraints
    arrays = {}
    from ..native.fastpack import pack_ints
    for name, which in (("a", 0), ("b", 1), ("c", 2)):
        indptr = [0]
        idx = []
        coefs = []
        for row in shape.rows:
            for v, c in sorted(row[which].items()):
                idx.append(v)
                coefs.append(int(c % shape.p))
            indptr.append(len(idx))
        arrays[f"{name}_indptr"] = np.asarray(indptr, dtype=np.int64)
        arrays[f"{name}_idx"] = np.asarray(idx, dtype=np.int64)
        arrays[f"{name}_coef"] = np.frombuffer(pack_ints(coefs),
                                               dtype=np.uint8)
    arrays["meta"] = np.asarray(
        [shape.num_inputs, shape.num_aux, m], dtype=np.int64)
    buf = io.BytesIO()
    np.savez_compressed(buf, digest=np.frombuffer(
        shape.digest.encode(), dtype=np.uint8), **arrays)
    _atomic_write(_shape_path(key), buf.getvalue())


def load_shape(key: str, field):
    """Reconstruct an R1CSShape-equivalent from the cache or None."""
    path = _shape_path(key)
    if not path.exists():
        return None
    from ..proof.nova import R1CSShape
    try:
        z = np.load(path)
    except OSError:
        return None
    num_inputs, num_aux, m = (int(v) for v in z["meta"])
    csr = {}
    for name, which in (("a", 0), ("b", 1), ("c", 2)):
        indptr = z[f"{name}_indptr"]
        idx = z[f"{name}_idx"]
        coef_bytes = z[f"{name}_coef"].tobytes()
        # native CSR arrays, reused directly by native.r1cs.handle_for
        # (skips the 70s python re-conversion at registration)
        csr[which] = (indptr.astype(np.uint64),
                      idx.astype(np.uint64),
                      np.frombuffer(coef_bytes, dtype=np.uint64))
    shape = R1CSShape.__new__(R1CSShape)
    shape.p = field.modulus
    shape.field = field
    shape.num_inputs = num_inputs
    shape.num_aux = num_aux
    # lazy: the python LC-dict rows (~4M dict inserts for the big
    # augmented shapes, 5-10s) are only needed by python fallbacks —
    # the native paths use `csr` directly
    shape.rows = _LazyRows(csr, m)
    shape.digest = z["digest"].tobytes().decode()
    shape.csr = csr
    return shape


class _LazyRows:
    """List-like view over cached CSR arrays that materializes the
    python LC-dict rows only on real access (len() stays cheap)."""

    def __init__(self, csr, m: int):
        self._csr = csr
        self._m = m
        self._rows = None

    def _mat(self):
        if self._rows is None:
            from ..native.fastpack import unpack_ints
            rows = [({}, {}, {}) for _ in range(self._m)]
            for which in range(3):
                indptr, idx, coef = self._csr[which]
                coefs = unpack_ints(coef.tobytes())
                idx_l = idx.tolist()
                ip = indptr.tolist()
                for r in range(self._m):
                    lc = rows[r][which]
                    for j in range(ip[r], ip[r + 1]):
                        lc[idx_l[j]] = coefs[j]
            self._rows = rows
        return self._rows

    def __len__(self) -> int:
        return self._m

    def __iter__(self):
        return iter(self._mat())

    def __getitem__(self, i):
        return self._mat()[i]


def cached_shape(key, field, synth_fn):
    """Load an R1CSShape from the disk cache or synthesize + save it.
    The cycle backends' augmented shapes cost minutes of python LC
    algebra to synthesize; the cache turns that into an npz load."""
    shape = load_shape(key, field)
    if shape is not None:
        return shape
    shape = synth_fn()
    try:
        save_shape(key, shape)
    except OSError:
        pass
    return shape
