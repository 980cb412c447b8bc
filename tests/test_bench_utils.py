"""Unit tests for the benchmark utilities the driver depends on."""

import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from bench import SCAN_ITERS, make_scan_bench, measure


class TestScanBench:
    def test_scan_executes_body_n_times(self):
        calls = {"traced": 0}

        def apply_fn(variables, rgb, depth):
            calls["traced"] += 1
            return rgb * variables["k"]

        run = make_scan_bench(apply_fn)
        out = run({"k": jnp.asarray(2.0)}, jnp.ones((1, 2, 2, 1)), None)
        assert np.isfinite(float(out))
        assert calls["traced"] == 1  # traced once, executed N times

    def test_measure_returns_positive_seconds(self):
        run = make_scan_bench(lambda v, r, d: r * 1.0001)

        @jax.jit
        def nop(v, r, d):
            return jnp.sum(r[0, 0, 0])

        t = measure(run, nop, None, jnp.ones((1, 4, 4, 1)), None, reps=2)
        assert t > 0

    def test_scan_iters_positive(self):
        assert SCAN_ITERS >= 1


def test_bench_json_contract():
    """bench.py's output contract: one JSON object on stdout with the four
    required keys (checked statically — running it needs the TPU)."""
    import ast

    src = open("bench.py").read()
    assert '"metric"' in src and '"value"' in src
    assert '"unit"' in src and '"vs_baseline"' in src
    ast.parse(src)
