#!/usr/bin/env python
"""Batch-scaling probe (VERDICT r1 weak 4): per-sample latency of the
flagship dense forward across batch sizes, isolating where the bs>8
throughput collapse comes from. Modes:

  BS_LIST=1,4,8,16,32 python tools/perf_bs_scaling.py          # full model
  PART=decoder|encoder|stems python tools/perf_bs_scaling.py   # subgraphs

Uses the scan-in-jit timing from bench.py.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from bench import make_scan_bench, measure, setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    h, w = 480, 640
    part = os.environ.get("PART", "full")
    bs_list = [int(b) for b in
               os.environ.get("BS_LIST", "1,4,8,16,32").split(",")]
    model = _flagship(h, w)
    rng = np.random.default_rng(0)

    variables = None
    for bs in bs_list:
        rgb = jnp.asarray(rng.standard_normal((bs, h, w, 3)).astype(np.float32))
        depth = jnp.asarray(
            rng.standard_normal((bs, h, w, 1)).astype(np.float32))
        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), rgb, depth,
                                   train=False)

        @jax.jit
        def nop(v, r, d):
            return jnp.sum(r[0, 0, 0])

        if part == "full":
            fn = lambda v, r, d: model.apply(v, r, d, train=False, hard=True)
        elif part == "stems":
            fn = lambda v, r, d: model.apply(
                v, r, d, method=lambda m, r, d: m._stems(r, d, False)[0])
        elif part == "encoder":
            def fn(v, r, d):
                def f(m, r, d):
                    rp, dp = m._stems(r, d, False)
                    fused = rp
                    for i in (1, 2, 3, 4):
                        rr = getattr(m.encoder_rgb, f"layer{i}")(fused, False)
                        dp = getattr(m.encoder_depth, f"layer{i}")(dp, False)
                        fused = m.fuse(i, rr, dp)
                    return fused
                return model.apply(v, r, d, method=f)
        elif part == "decoder":
            def fn(v, r, d):
                def f(m, r, d):
                    rp, dp = m._stems(r, d, False)
                    fused = rp
                    skips = []
                    for i in (1, 2, 3, 4):
                        rr = getattr(m.encoder_rgb, f"layer{i}")(fused, False)
                        dp = getattr(m.encoder_depth, f"layer{i}")(dp, False)
                        fused = m.fuse(i, rr, dp)
                        if i < 4:
                            skips.append(m.skip(i, fused, False))
                    return m.head(fused, skips, False)
                return model.apply(v, r, d, method=f)
        else:
            raise SystemExit(f"unknown PART={part}")

        t = measure(make_scan_bench(fn), nop, variables, rgb, depth, reps=3)
        print(f"{part} bs={bs:<3d} {t*1e3:8.3f} ms/batch "
              f"{t/bs*1e3:7.3f} ms/sample ({bs/t:7.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
