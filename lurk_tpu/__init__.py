"""lurk_tpu: a TPU-native zk-proving framework with Lurk capabilities.

Layers (mirroring SURVEY.md §1): parser/symbols -> content-addressed
store -> LEM (IR, interpreter, universal step) -> R1CS circuit ->
Nova-style folding -> CLI/REPL. Device kernels: batched Poseidon,
limb field arithmetic, EC/Pippenger MSM (jax/XLA; Pallas experimental).
"""

import os as _os


def _enable_compilation_cache() -> None:
    """Persist compiled XLA/Mosaic executables across processes.

    The unrolled limb kernels trade compile time for runtime; caching
    makes the compile a one-time cost per kernel shape.
    """
    try:
        import jax
        cache_dir = _os.environ.get(
            "LURK_TPU_JAX_CACHE",
            _os.path.join(_os.path.expanduser("~"), ".lurk_tpu",
                          "jax_cache"))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()
