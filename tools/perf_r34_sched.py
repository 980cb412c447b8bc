#!/usr/bin/env python
"""Flagship (R34-NBt1D) capacity-schedule A/B under the recipe gate.

Same question perf_r50_trace.py answered for R50: the shared ladder
(0, bs/2, bs) pays 8 executed lax.cond boundaries on a 2-path gate; with
the flagship recipe mix [.53 k0, 0, .47 k2, 0, 0] the per-stage schedule
((4,8),(4,8),(0,8),(0,8)) pays 4 and the strict capacity-factor schedule
((5,),(5,),(0,),(0,)) pays none. Candidates run bf16 + host-packed stems
(the shipped serving config) and are traced for device-timeline truth.

Usage:  python tools/perf_r34_sched.py          (real TPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "40"))
ROUNDS = int(os.environ.get("ROUNDS", "3"))
BS = 8


def main():
    import bench as bench_mod
    from bench import (load_recipe_gate, make_recipe_eval_batch,
                       make_scan_bench, measure_interleaved,
                       setup_compilation_cache)
    import perf_r50_trace
    perf_r50_trace.ITERS = ITERS
    while_ms = perf_r50_trace.while_ms

    bench_mod.SCAN_ITERS = ITERS
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from dynmm_tpu.models.resnet import space_to_depth_host
    from dynmm_tpu.models.skip_gate import capacity_ladders

    h, w = 480, 640
    model = _flagship(h, w, dtype=jnp.bfloat16)
    rgb0, depth0 = make_recipe_eval_batch(BS, h, w)
    rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)
    variables = _flagship(h, w).init(
        jax.random.PRNGKey(0), rgb, depth, train=False)
    variables, ratios, _ = load_recipe_gate(variables)
    assert ratios is not None
    sched = capacity_ladders(ratios, BS)
    strict = capacity_ladders(ratios, BS, capacity_factor=1.25)
    print(f"ratios {np.array2string(ratios, precision=3)}  sched {sched}  "
          f"strict {strict}", flush=True)
    rgb_p = jnp.asarray(space_to_depth_host(rgb0))
    depth_p = jnp.asarray(space_to_depth_host(depth0))

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    cands = {
        "dense": lambda v, r, d: model.apply(
            v, r, d, train=False, baseline=True),
        "routed_048": lambda v, r, d: model.apply(
            v, r, d, caps=(0, BS // 2, BS),
            method=model.forward_routed_compact),
        "routed_sched": lambda v, r, d: model.apply(
            v, r, d, caps=sched, method=model.forward_routed_compact),
        "routed_strict": lambda v, r, d: model.apply(
            v, r, d, caps=strict, strict_caps=True,
            method=model.forward_routed_compact),
    }
    runs = {k: make_scan_bench(f) for k, f in cands.items()}

    for name, fn in runs.items():
        fn(variables, rgb_p, depth_p).block_until_ready()
    for name, fn in runs.items():
        d = f"/tmp/r34_traces/{name}"
        with jax.profiler.trace(d):
            fn(variables, rgb_p, depth_p).block_until_ready()
        print(f"trace {name}: while = {while_ms(d):.3f} ms/iter", flush=True)

    meds = measure_interleaved(runs, nop, variables, rgb_p, depth_p,
                               rounds=ROUNDS, iters=ITERS)
    for k, t in meds.items():
        print(f"scan  {k}: {t*1e3:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
