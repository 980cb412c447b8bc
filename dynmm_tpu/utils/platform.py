"""Platform selection helpers.

In this deployment the axon TPU plugin overrides ``JAX_PLATFORMS`` env vars,
so CPU-only runs (tests, CI, data prep) must force the platform through
``jax.config`` before the backend initializes. Set ``DYNMM_FORCE_CPU=1`` or
call ``maybe_force_cpu()`` early in any entry point that should not grab the
TPU.
"""

from __future__ import annotations

import os


def maybe_force_cpu(n_devices: int | None = None) -> None:
    if os.environ.get("DYNMM_FORCE_CPU", "0") not in ("", "0", "false"):
        import jax

        jax.config.update("jax_platforms", "cpu")
        if n_devices is None:
            # virtual multi-device CPU runs (mesh CLIs under test)
            n_devices = int(os.environ.get("DYNMM_CPU_DEVICES", "0")) or None
        if n_devices:
            jax.config.update("jax_num_cpu_devices", n_devices)


def setup_compilation_cache() -> None:
    """Persist compiled programs in <repo>/.jax_cache across processes.
    TPU compiles run server-side and take minutes; the persistent cache
    makes re-runs (e.g. the two train.py stages of
    tools/train_recipe_gate.py, or repeated eval.py calls) near-instant.
    Opt out with DYNMM_NO_COMPILE_CACHE=1."""
    if os.environ.get("DYNMM_NO_COMPILE_CACHE", "0") not in ("", "0", "false"):
        return
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
