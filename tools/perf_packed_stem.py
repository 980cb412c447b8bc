#!/usr/bin/env python
"""Host-packed space-to-depth stem probe. perf_bs1_opt.py's trace showed
the s2d stem CONV is 5.5x faster than the plain 7x7 (75 vs 413+156 us at
bs=1) but the on-device 2x2 shuffle eats the win (~670 us). This probe
feeds the shuffle-free pre-packed form (resnet.space_to_depth_host) and
measures dense/switch at bs=1 and dense/routed at bs=8, fp32 + bf16,
interleaved against the status quo.
"""

import json as js
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "50"))
ROUNDS = int(os.environ.get("ROUNDS", "5"))


def main():
    import bench as bench_mod
    from bench import (load_trained_gate, make_eval_batch, make_scan_bench,
                       measure_interleaved, setup_compilation_cache)

    bench_mod.SCAN_ITERS = ITERS
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from dynmm_tpu.models.resnet import space_to_depth_host

    h, w = 480, 640
    model = _flagship(h, w)
    model16 = _flagship(h, w, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    def dense(m):
        return lambda v, r, d: m.apply(v, r, d, train=False, baseline=True)

    def switch(m):
        return lambda v, r, d: m.apply(v, r, d, method=m.forward_switch)

    out = {}
    for bs in (1, 8):
        rgb0, depth0 = make_eval_batch(rng, max(bs, 2), h, w)
        rgb = jnp.asarray(rgb0[:bs])
        depth = jnp.asarray(depth0[:bs])
        rgb_p = jnp.asarray(space_to_depth_host(rgb0[:bs]))
        depth_p = jnp.asarray(space_to_depth_host(depth0[:bs]))
        variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
        variables, _ = load_trained_gate(variables)

        if bs == 1:
            runs = {
                "dense": make_scan_bench(dense(model)),
                "switch": make_scan_bench(switch(model)),
                "dense_bf16": make_scan_bench(dense(model16)),
                "switch_bf16": make_scan_bench(switch(model16)),
            }
        else:
            def routed(m):
                return lambda v, r, d: m.apply(
                    v, r, d, caps=(0, bs // 2, bs),
                    method=m.forward_routed_compact)
            runs = {
                "dense": make_scan_bench(dense(model)),
                "routed": make_scan_bench(routed(model)),
                "dense_bf16": make_scan_bench(dense(model16)),
                "routed_bf16": make_scan_bench(routed(model16)),
            }
        # packed twins share the jitted callable; shapes disambiguate
        allruns, allargs = {}, {}
        for k, f in runs.items():
            allruns[k] = f
            allargs[k] = (variables, rgb, depth)
            allruns[k + "_packed"] = f
            allargs[k + "_packed"] = (variables, rgb_p, depth_p)

        # interleave manually since args differ per candidate
        import time
        for k, f in allruns.items():
            float(f(*allargs[k]))  # compile+warm
        raw = {k: [] for k in allruns}
        names = list(allruns)
        for rnd in range(ROUNDS):
            for k in names[rnd % len(names):] + names[:rnd % len(names)]:
                t0 = time.perf_counter()
                float(allruns[k](*allargs[k]))
                total = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(nop(*allargs[k]))
                overhead = time.perf_counter() - t0
                raw[k].append(max(total - overhead, 1e-9) / ITERS)
        meds = {k: float(np.median(v)) for k, v in raw.items()}
        for k, t in meds.items():
            print(f"bs={bs} {k}: {t*1e3:.3f} ms", file=sys.stderr)
        out[f"bs{bs}"] = {k: round(v * 1e3, 3) for k, v in meds.items()}

    anchor = bench_mod.measure_matmul_anchor()
    out["anchor"] = anchor
    print(js.dumps(out))


if __name__ == "__main__":
    main()
