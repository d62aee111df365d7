"""Global configuration system.

Parity: /root/reference/src/config.rs:13-246 — a process-wide `Settings`
resolved with priority: explicit overrides > `LURK_TPU_*` environment
variables > TOML file (`~/.lurk_tpu/lurk.toml` or `$LURK_TPU_CONFIG`) >
defaults. `PerfConfig` maps the reference's parallelism axes
(`Flow::{Sequential,Parallel}` on witness-gen/frames/slots) onto the TPU
pipeline's knobs: device batching thresholds and parallel witness
generation.
"""

from __future__ import annotations

import dataclasses
import os
import tomllib
from pathlib import Path
from typing import Optional

CANNED = ("fully-parallel", "parallel-steps-only", "fully-sequential")


@dataclasses.dataclass
class PerfConfig:
    """Parallelism axes (config.rs:115-246)."""

    # device batching for store hydration (waves >= threshold go on device)
    device_hydration: bool = True
    device_wave_threshold: int = 64
    # batched witness generation across frames (vs per-frame loop)
    parallel_witness_gen: bool = True
    # overlap witness generation with folding (pipeline axis)
    witgen_folding_pipeline: bool = True
    # device MSM threshold (points below run on host Pippenger)
    device_msm_threshold: int = 4096

    @staticmethod
    def canned(name: str) -> "PerfConfig":
        if name == "fully-sequential":
            return PerfConfig(device_hydration=False,
                              parallel_witness_gen=False,
                              witgen_folding_pipeline=False)
        if name == "parallel-steps-only":
            return PerfConfig(parallel_witness_gen=False)
        return PerfConfig()


@dataclasses.dataclass
class Settings:
    rc: int = 10
    limit: int = 100_000_000
    field: str = "bn256"
    backend: str = "supernova-cycle"
    cache_dir: str = dataclasses.field(
        default_factory=lambda: os.path.join(os.path.expanduser("~"),
                                             ".lurk_tpu"))
    perf: PerfConfig = dataclasses.field(default_factory=PerfConfig)


_SETTINGS: Optional[Settings] = None


def _from_toml(path: Path) -> dict:
    try:
        with open(path, "rb") as fh:
            return tomllib.load(fh)
    except FileNotFoundError:
        return {}


def load_settings(overrides: Optional[dict] = None) -> Settings:
    """Resolve settings with the reference's priority order."""
    cfg_path = Path(os.environ.get(
        "LURK_TPU_CONFIG",
        os.path.join(os.path.expanduser("~"), ".lurk_tpu", "lurk.toml")))
    data = _from_toml(cfg_path)

    def pick(key: str, default, cast=None):
        env = os.environ.get(f"LURK_TPU_{key.upper()}")
        if overrides and key in overrides:
            v = overrides[key]
        elif env is not None:
            v = env
        elif key in data:
            v = data[key]
        else:
            return default
        return cast(v) if cast else v

    perf_name = pick("perf", None)
    perf = PerfConfig.canned(perf_name) if perf_name else PerfConfig()
    return Settings(
        rc=pick("rc", 10, int),
        limit=pick("limit", 100_000_000, int),
        field=pick("field", "bn256", str),
        backend=pick("backend", "supernova-cycle", str),
        cache_dir=pick("cache_dir",
                       os.path.join(os.path.expanduser("~"), ".lurk_tpu"),
                       str),
        perf=perf,
    )


def settings() -> Settings:
    """Process-wide settings (OnceCell parity: config.rs:13-32)."""
    global _SETTINGS
    if _SETTINGS is None:
        _SETTINGS = load_settings()
    return _SETTINGS


def set_settings(s: Settings) -> None:
    global _SETTINGS
    _SETTINGS = s
