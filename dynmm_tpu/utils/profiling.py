"""Tracing / profiling / timing utilities (aux subsystem, SURVEY §5.1).

The reference's ad-hoc mechanisms get first-class TPU equivalents:
* thop MAC counting            → ``dynmm_tpu.utils.flops`` (XLA cost analysis)
* CUDA-event latency timing    → ``test_time`` below (on-device scan timing,
  replacing ``Supervised_Learning.py:350-371``)
* phase wall-clock timers      → ``PhaseTimer`` (train.py:377-381 semantics)
* (new) ``jax.profiler`` trace capture for TensorBoard-compatible profiles
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import numpy as np


class PhaseTimer:
    """Accumulating named wall-clock phase timers (copy/forward/post/cm)."""

    def __init__(self):
        self.totals: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.time() - t0

    def as_logs(self, prefix: str = "time_") -> dict:
        return {prefix + k: v for k, v in self.totals.items()}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/dynmm_trace"):
    """jax.profiler trace capture (view in TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def test_time(
    apply_fn: Callable,
    loader,
    to_device_batch: Callable,
    repetitions: int = 10,
    scan_iters: int = 10,
) -> tuple[float, float]:
    """Inference latency over a full loader × N repetitions — the functional
    equivalent of the reference's CUDA-event harness. Returns (mean, std)
    seconds per full pass. ``apply_fn(batch) -> array`` must be jitted."""
    import jax

    timings = np.zeros(repetitions)
    batches = [to_device_batch(b) for b in loader]
    # warm-up / compile
    for b in batches:
        out = apply_fn(b)
    jax.block_until_ready(out)
    for rep in range(repetitions):
        t0 = time.perf_counter()
        for b in batches:
            out = apply_fn(b)
        jax.block_until_ready(out)
        timings[rep] = time.perf_counter() - t0
    return float(timings.mean()), float(timings.std())
