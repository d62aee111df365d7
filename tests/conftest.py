"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding tests run
on a virtual 8-device CPU platform.

The axon TPU plugin's sitecustomize imports jaxlib at interpreter
startup (before any conftest code), which snapshots XLA_FLAGS — later
env changes cannot create the virtual CPU devices. When that plugin is
active, re-exec pytest once with a clean environment, restoring the real
stdout/stderr first (pytest's fd capture is already on by configure
time).
"""

import os
import sys

# FORCE cpu (not setdefault): an ambient JAX_PLATFORMS=axon with
# PALLAS_AXON_POOL_IPS unset would otherwise leak through and fail
# every device test with "Unable to initialize backend 'axon'".
# jax is not yet imported at conftest import time unless the axon
# sitecustomize ran (PALLAS_AXON_POOL_IPS set — handled by the
# re-exec below), so a plain override is effective here.
os.environ["JAX_PLATFORMS"] = "cpu"
# fork-pool witness gen can deadlock after the XLA client initializes
# (earlier tests touch jax); keep test runs single-process
os.environ.setdefault("LURK_TPU_PERF", "parallel-steps-only")
# one shared params cache per suite run: generator derivation is slow,
# and proofs/commitments are content-keyed so sharing is safe
if "LURK_TPU_CACHE" not in os.environ:
    import tempfile
    os.environ["LURK_TPU_CACHE"] = tempfile.mkdtemp(
        prefix="lurk_tpu_test_cache_")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def pytest_configure(config):
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.suspend_global_capture(in_=True)
            capman.stop_global_capturing()
        except Exception:
            pass
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
