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
