"""Native (C++) host-runtime components.

The reference's performance-critical host loops live in external Rust
crates (arecibo's MSM, neptune's Poseidon — Cargo.toml:128-137). Here
the equivalents are C++ translation units compiled on first use with the
system toolchain and loaded via ctypes; every component has a pure-
Python oracle and bit-exactness tests.

Components:
  msm.cpp — Pippenger multi-scalar multiplication (Pedersen commitments
            of the Nova fold), threaded over windows.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

_SRC_DIR = Path(__file__).parent
_LIBS: dict = {}
_LOAD_LOCK = threading.Lock()


def _cache_dir() -> Path:
    base = os.environ.get("LURK_TPU_CACHE",
                          os.path.join(os.path.expanduser("~"),
                                       ".lurk_tpu"))
    d = Path(base) / "native"
    d.mkdir(parents=True, exist_ok=True)
    return d


def load(name: str) -> Optional[ctypes.CDLL]:
    """Compile (cached by source hash) and load lurk_tpu/native/<name>.cpp.
    Returns None if no C++ toolchain is available.

    Thread/process-safe: concurrent callers (e.g. the threaded
    compress proving both spartan sides at once, or parallel pytest
    processes sharing a cache dir) compile to a caller-unique tmp and
    atomically os.replace into place — the first replace wins, the
    rest are byte-identical."""
    with _LOAD_LOCK:
        if name in _LIBS:
            return _LIBS[name]
        src = _SRC_DIR / f"{name}.cpp"
        code = src.read_bytes()
        for hdr in sorted(_SRC_DIR.glob("*.h")):
            code += hdr.read_bytes()
        tag = hashlib.sha256(code).hexdigest()[:16]
        so = _cache_dir() / f"{name}-{tag}.so"
        if not so.exists():
            tmp = so.with_suffix(
                f".{os.getpid()}.{threading.get_ident()}.tmp")
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-std=c++17", "-pthread", str(src), "-o", str(tmp)]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=300)
                os.replace(tmp, so)
            except (OSError, subprocess.SubprocessError):
                # another process may have won the compile race and
                # installed the identical .so; only fail if absent
                if not so.exists():
                    _LIBS[name] = None
                    return None
            finally:
                try:
                    if tmp.exists():
                        tmp.unlink()
                except OSError:
                    pass
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:
            lib = None
        _LIBS[name] = lib
        return lib
