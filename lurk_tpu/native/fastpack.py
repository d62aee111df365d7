"""Loader + fallback for the fastpack C extension (fastpack.c).

pack_ints / unpack_ints are the ONLY sanctioned bulk int<->bytes
converters on the prover hot path; they fall back to pure python when
no toolchain is available or a value is out of [0, 2^256)."""

from __future__ import annotations

import hashlib
import importlib.util
import os
import subprocess
import sysconfig
from pathlib import Path
from typing import List, Optional, Sequence

_SRC = Path(__file__).parent / "fastpack.c"
_MOD = None
_TRIED = False


def _cache_dir() -> Path:
    base = os.environ.get("LURK_TPU_CACHE",
                          os.path.join(os.path.expanduser("~"),
                                       ".lurk_tpu"))
    d = Path(base) / "native"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _load():
    global _MOD, _TRIED
    if _MOD is not None or _TRIED:
        return _MOD
    _TRIED = True
    code = _SRC.read_bytes()
    tag = hashlib.sha256(code).hexdigest()[:16]
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    so = _cache_dir() / f"lurk_fastpack-{tag}{suffix}"
    if not so.exists():
        inc = sysconfig.get_paths()["include"]
        tmp = so.with_suffix(".tmp.so")
        cmd = ["gcc", "-O2", "-shared", "-fPIC", f"-I{inc}",
               str(_SRC), "-o", str(tmp)]
        try:
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=120)
            os.replace(tmp, so)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        spec = importlib.util.spec_from_file_location("lurk_fastpack",
                                                      so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        # self-check before trusting a private-API-based extension
        probe = [0, 1, (1 << 256) - 1, 12345678901234567890]
        assert mod.unpack32(mod.pack32(probe)) == probe
        _MOD = mod
    except Exception:
        _MOD = None
    return _MOD


def available() -> bool:
    return _load() is not None


def pack_ints(values: Sequence[int]) -> bytes:
    """32-byte LE packing; values must be in [0, 2^256)."""
    mod = _load()
    if mod is not None:
        try:
            return mod.pack32(values if isinstance(values, (list, tuple))
                              else list(values))
        except Exception:
            pass
    return b"".join(int(v).to_bytes(32, "little") for v in values)


def unpack_ints(buf) -> List[int]:
    mod = _load()
    if mod is not None:
        try:
            return mod.unpack32(bytes(buf))
        except Exception:
            pass
    by = bytes(buf)
    return [int.from_bytes(by[32 * i:32 * (i + 1)], "little")
            for i in range(len(by) // 32)]
