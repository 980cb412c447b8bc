#!/usr/bin/env python
"""Device-timeline truth for R50 routed-vs-dense with the recipe gate.

bench_r50 (scan wall, BENCH_r04 era) shows routed 22.8 ms vs dense 21.9 —
but scan-wall deltas carry 0.5-1.3 ms/iter of one-time dispatch cost
amortized over only SCAN_ITERS=10 iters, and routed graphs pay more of it
than dense (CLAUDE.md, tools/perf_routed_decomp.py reconciliation). The
jax.profiler trace's while-loop duration repeats to ±2 µs and is the
authoritative per-iter serving time. This probe traces dense / forced k1 /
forced k2 / routed-compact (shipped ladder and the all-skip ladder) once
each and prints the while-loop ms/iter, plus an interleaved scan wall
cross-check at higher ITERS.

Usage:  python tools/perf_r50_trace.py           (real TPU, ~10 min warm)
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "40"))
ROUNDS = int(os.environ.get("ROUNDS", "3"))
BS = 8


def while_ms(trace_dir):
    """Per-iter duration of the scan while-loop on the /device:TPU lane."""
    base = os.path.join(trace_dir, "plugins", "profile")
    runs = sorted(glob.glob(os.path.join(base, "*")))
    files = [f for f in glob.glob(os.path.join(runs[-1], "*.trace.json.gz"))]
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    dev_pids = {
        e["pid"] for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "/device:TPU" in e.get("args", {}).get("name", "")
    }
    durs = [
        e["dur"] for e in tr["traceEvents"]
        if e.get("ph") == "X" and e.get("pid") in dev_pids
        and e.get("name", "").startswith("while")
    ]
    assert durs, f"no while events in {trace_dir}"
    # one while event per scan call; its body runs ITERS times
    return max(durs) / 1e3 / ITERS


def main():
    import bench as bench_mod
    from bench import (load_recipe_gate, make_recipe_eval_batch,
                       make_scan_bench, measure_interleaved,
                       setup_compilation_cache)

    bench_mod.SCAN_ITERS = ITERS
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.models.esanet import ESANetConfig
    from dynmm_tpu.models.skip_gate import SkipGateESANet, capacity_ladders

    cfg = ESANetConfig(
        height=480, width=640, num_classes=40,
        encoder_rgb="resnet50", encoder_depth="resnet50",
        encoder_block="Bottleneck",
        channels_decoder=(512, 256, 128), nr_decoder_blocks=(3, 3, 3),
        fuse_depth_in_rgb_encoder="SE-add",
        upsampling="learned-3x3-zeropad",
    )
    model = SkipGateESANet(cfg)
    rgb0, depth0 = make_recipe_eval_batch(BS, 480, 640)
    rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    variables, ratios, _ = load_recipe_gate(variables, "resnet50")
    assert ratios is not None, "recipe R50 gate asset missing"
    print(f"gate ratios: {np.array2string(ratios, precision=3)}", flush=True)

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    cands = {
        "dense": lambda v, r, d: model.apply(
            v, r, d, train=False, baseline=True),
        "force_k1": lambda v, r, d: model.apply(
            v, r, d, force_path=1, method=model.forward_switch_batched),
        "force_k2": lambda v, r, d: model.apply(
            v, r, d, force_path=2, method=model.forward_switch_batched),
        # shipped ladder
        "routed_048": lambda v, r, d: model.apply(
            v, r, d, caps=(0, BS // 2, BS),
            method=model.forward_routed_compact),
        # single-rung full ladder: machinery without conds or skipping
        "routed_full": lambda v, r, d: model.apply(
            v, r, d, caps=(BS,), method=model.forward_routed_compact),
        # per-stage capacity schedule from the trained ratios: 3 conds
        # instead of 8 (skip_gate.capacity_ladders)
        "routed_sched": lambda v, r, d: model.apply(
            v, r, d, caps=capacity_ladders(ratios, BS),
            method=model.forward_routed_compact),
        # strict capacity-factor schedule: zero conds, graceful drops
        "routed_strict": lambda v, r, d: model.apply(
            v, r, d, caps=capacity_ladders(ratios, BS, capacity_factor=1.25),
            strict_caps=True, method=model.forward_routed_compact),
    }
    runs = {k: make_scan_bench(f) for k, f in cands.items()}

    # compile + device-timeline trace (one scan call each)
    for name, fn in runs.items():
        fn(variables, rgb, depth).block_until_ready()  # warm/compile
    for name, fn in runs.items():
        d = f"/tmp/r50_traces/{name}"
        with jax.profiler.trace(d):
            fn(variables, rgb, depth).block_until_ready()
        print(f"trace {name}: while = {while_ms(d):.3f} ms/iter", flush=True)

    meds = measure_interleaved(runs, nop, variables, rgb, depth,
                               rounds=ROUNDS, iters=ITERS)
    for k, t in meds.items():
        print(f"scan  {k}: {t*1e3:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
