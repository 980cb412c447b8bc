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
