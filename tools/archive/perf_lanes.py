#!/usr/bin/env python
"""Do narrow-channel NHWC maps pay lane padding in HBM on v5e?

Times a pure streaming op (relu + scale) over maps with equal element count
but different channel widths; if C=64 costs the same as C=128 (rather than
half), narrow maps are stored lane-padded and the whole stem/stage-1 region
(C=64) pays 2x HBM traffic. Also times the stem-resolution SE fusion cell in
isolation at its native width.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from bench import setup_compilation_cache

    setup_compilation_cache()
    import time

    import jax
    import jax.numpy as jnp

    iters = int(os.environ.get("BENCH_SCAN_ITERS", "30"))

    def scan_bench(fn, x):
        @jax.jit
        def run(x):
            def body(c, _):
                out = fn(c)
                return c + 1e-30 * jnp.mean(out).astype(c.dtype), ()
            c, _ = jax.lax.scan(body, x, None, length=iters)
            return jnp.sum(c[(0,) * c.ndim].astype(jnp.float32))

        @jax.jit
        def nop(x):
            return jnp.sum(x[(0,) * x.ndim].astype(jnp.float32))

        float(run(x)); float(nop(x))
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter(); float(run(x))
            tot = time.perf_counter() - t0
            t0 = time.perf_counter(); float(nop(x))
            ov = time.perf_counter() - t0
            best = min(best, max(tot - ov, 1e-9) / iters)
        return best

    rng = np.random.default_rng(0)

    # equal element count (8 * 240*320 * 64), varying channel width
    shapes = [
        (8, 240, 320, 64),
        (8, 240, 160, 128),
        (8, 120, 160, 256),
        (8, 480, 320, 32),
        (8, 240, 320 * 64 // 8, 8),
    ]
    for s in shapes:
        x = jnp.asarray(rng.standard_normal(s).astype(np.float32))
        t = scan_bench(lambda v: jax.nn.relu(v) * 1.0001, x)
        gb = x.size * 4 * 2 / 1e9
        print(f"relu stream {str(s):<24} {t*1e3:8.3f} ms "
              f"({gb/t:6.0f} GB/s effective)", flush=True)

    # the stem-resolution SE fusion cell at its native width
    from dynmm_tpu.nn.layers import SqueezeAndExciteFusionAdd, max_pool_3x3_s2

    cell = SqueezeAndExciteFusionAdd(64)
    xr = jnp.asarray(rng.standard_normal((8, 240, 320, 64)).astype(np.float32))
    xd = jnp.asarray(rng.standard_normal((8, 240, 320, 64)).astype(np.float32))
    v = cell.init(jax.random.PRNGKey(0), xr, xd)

    @jax.jit
    def run_cell(xr, xd):
        def body(c, _):
            out = max_pool_3x3_s2(cell.apply(v, c, xd))
            return c + 1e-30 * jnp.mean(out), ()
        c, _ = jax.lax.scan(body, xr, None, length=iters)
        return jnp.sum(c[0, 0, 0])

    @jax.jit
    def nop2(xr, xd):
        return jnp.sum(xr[0, 0, 0])

    import time as _t
    float(run_cell(xr, xd)); float(nop2(xr, xd))
    best = np.inf
    for _ in range(4):
        t0 = _t.perf_counter(); float(run_cell(xr, xd))
        tot = _t.perf_counter() - t0
        t0 = _t.perf_counter(); float(nop2(xr, xd))
        ov = _t.perf_counter() - t0
        best = min(best, max(tot - ov, 1e-9) / iters)
    print(f"SE-fuse0 + maxpool @240x320x64 bs=8: {best*1e3:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
