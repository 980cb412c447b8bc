#!/usr/bin/env python
"""Decompose flagship inference latency into stage costs on the real TPU
(stems / gate / encoders / context+decoder), using the same scan-in-jit
timing methodology as bench.py. Guides kernel-level optimization."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import SCAN_ITERS, make_scan_bench, measure, setup_compilation_cache
    from __graft_entry__ import _flagship
    from dynmm_tpu.nn.layers import max_pool_3x3_s2

    setup_compilation_cache()
    h, w = 480, 640
    bs = int(os.environ.get("BS", "1"))
    model = _flagship(h, w)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.standard_normal((bs, h, w, 3)).astype(np.float32))
    depth = jnp.asarray(rng.standard_normal((bs, h, w, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    def part(name, fn):
        t = measure(make_scan_bench(fn), nop, variables, rgb, depth, reps=2)
        print(f"{name::<30} {t*1e3:8.3f} ms")
        return t

    def stems(v, r, d):
        return model.apply(v, r, d, method=lambda m, r, d: m._stems(r, d, False)[0])

    def stems_gate(v, r, d):
        def f(m, r, d):
            rp, dp = m._stems(r, d, False)
            return m.gate_weights(rp, dp, hard=True)
        return model.apply(v, r, d, method=f)

    def rgb_encoder_only(v, r, d):
        def f(m, r, d):
            rp, dp = m._stems(r, d, False)
            x = rp
            for i in (1, 2, 3, 4):
                x = getattr(m.encoder_rgb, f"layer{i}")(x, False)
            return x
        return model.apply(v, r, d, method=f)

    def both_encoders(v, r, d):
        def f(m, r, d):
            rp, dp = m._stems(r, d, False)
            x, y = rp, dp
            for i in (1, 2, 3, 4):
                x = getattr(m.encoder_rgb, f"layer{i}")(x, False)
                y = getattr(m.encoder_depth, f"layer{i}")(y, False)
                x = m.fuse(i, x, y)
            return x
        return model.apply(v, r, d, method=f)

    def full(v, r, d):
        return model.apply(v, r, d, train=False, hard=True)

    part("stems", stems)
    part("stems+gate", stems_gate)
    part("stems+rgb encoder", rgb_encoder_only)
    part("stems+both encoders+fuse", both_encoders)
    part("full dense hard", full)


if __name__ == "__main__":
    main()
