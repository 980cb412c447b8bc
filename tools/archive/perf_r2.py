#!/usr/bin/env python
"""Round-2 perf probe on the real TPU: compare upsample lowerings
(naive nearest+depthwise / dilated-conv fused / shift-FMA fused) end-to-end,
and re-check the gate + stem decomposition with longer scans for stability.
Run: BENCH_SCAN_ITERS=30 python tools/perf_r2.py"""

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
    import dynmm_tpu.nn.layers as L

    h, w = 480, 640
    bs = int(os.environ.get("BS", "8"))
    model = _flagship(h, w)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.standard_normal((bs, h, w, 3)).astype(np.float32))
    depth = jnp.asarray(rng.standard_normal((bs, h, w, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    def part(name, fn, reps=3):
        t = measure(make_scan_bench(fn), nop, variables, rgb, depth, reps=reps)
        print(f"{name:<46} {t*1e3:8.3f} ms  ({bs/t:7.1f} fps)", flush=True)
        return t

    def full(v, r, d):
        return model.apply(v, r, d, train=False, hard=True)

    def routed(v, r, d):
        return model.apply(v, r, d, method=model.forward_switch_batched)

    def baseline(v, r, d):
        return model.apply(v, r, d, train=False, baseline=True)

    # -- upsample lowering comparison (full model end-to-end) ----------------
    for impl, label in [(None, "naive"), ("dilated", "dilated"),
                        ("shift", "shift")]:
        L.Upsample.fused = impl is not None
        if impl:
            L.Upsample.fused_impl = impl
        part(f"full dense hard ({label} upsample)", full)
    L.Upsample.fused = True
    L.Upsample.fused_impl = "shift"

    part("routed batched hard (shift)", routed)
    part("dense baseline always-fuse (shift)", baseline)

    # -- finer head decomposition --------------------------------------------
    def up_to_decoder(v, r, d):
        def f(m, r, d):
            rp, dp = m._stems(r, d, False)
            x, y = rp, dp
            skips = []
            for i in (1, 2, 3, 4):
                x = getattr(m.encoder_rgb, f"layer{i}")(x, False)
                y = getattr(m.encoder_depth, f"layer{i}")(y, False)
                x = m.fuse(i, x, y)
                if i < 4:
                    skips.append(m.skip(i, x, False))
            out = m.context_module(x, False)
            return out, skips
        return model.apply(v, r, d, method=f)[0]

    t_ctx = part("through context module", up_to_decoder)
    t_full = part("full dense hard (shift)", full)
    print(f"  -> decoder total: {(t_full - t_ctx)*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
