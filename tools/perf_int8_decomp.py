#!/usr/bin/env python
"""Where does the int8 q4 serving chain's remaining time go?

int8 dense packed q4 runs 6.61 ms on the device timeline vs 8.17 bf16 —
only 1.24x, far below the ~2x activation-byte ratio. Either requant
epilogues fail to fuse somewhere (inter-layer tensors round-tripping HBM
as bf16/fp32), or a large non-conv remainder (argmax tail, SE, BN glue)
doesn't scale with dtype. This probe traces one scan call per candidate
and aggregates the /device:TPU lane inside the while loop by op
CATEGORY (name prefix before the first '.': fusion/convolution/copy/...)
plus the top individual events — fusion numbering differs between
compilations (CLAUDE.md), so categories and ranked lists are compared,
never name-to-name diffs.

Usage:  python tools/perf_int8_decomp.py        (real TPU)
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TOPK = int(os.environ.get("TOPK", "12"))


def device_breakdown(trace_dir, iters):
    """(category -> ms/iter, [(event, ms/iter)] top list, while ms/iter)."""
    base = os.path.join(trace_dir, "plugins", "profile")
    runs = sorted(glob.glob(os.path.join(base, "*")))
    files = glob.glob(os.path.join(runs[-1], "*.trace.json.gz"))
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    dev_pids = {
        e["pid"] for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "/device:TPU" in e.get("args", {}).get("name", "")
    }
    per_event = defaultdict(float)
    whiles = []
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith("while"):  # umbrella event, not a leaf op
            whiles.append(e["dur"])
            continue
        per_event[name] += e["dur"]
    assert whiles, f"no while events in {trace_dir}"
    cats = defaultdict(float)
    for name, us in per_event.items():
        cats[name.split(".")[0]] += us / 1e3 / iters
    top = sorted(per_event.items(), key=lambda kv: -kv[1])[:TOPK]
    top = [(n, us / 1e3 / iters) for n, us in top]
    return dict(cats), top, max(whiles) / 1e3 / iters


def main():
    import bench as bench_mod
    from bench import (BS, load_recipe_gate, make_recipe_eval_batch,
                       make_scan_bench, setup_compilation_cache)

    iters = bench_mod.SCAN_ITERS
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from dynmm_tpu.models.resnet import space_to_depth_host
    from dynmm_tpu.nn.layers import first_argmax
    from dynmm_tpu.utils.quantize import calibrate, quant_sanity

    h, w = 480, 640
    model_bf16 = _flagship(h, w, dtype=jnp.bfloat16)
    model_calib = _flagship(h, w, quant="calib")
    model_int8 = _flagship(h, w, dtype=jnp.bfloat16, quant="int8")

    variables = _flagship(h, w).init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 1)), train=False)
    variables, ratios, _ = load_recipe_gate(variables)
    rgb0, depth0 = make_recipe_eval_batch(BS, h, w)
    rgb_p = jnp.asarray(space_to_depth_host(rgb0))
    depth_p = jnp.asarray(space_to_depth_host(depth0))

    def batches():
        for i in range(2):
            r0, d0 = make_recipe_eval_batch(BS, h, w, seed=100 + i)
            yield jnp.asarray(r0), jnp.asarray(d0)

    qcoll = calibrate(model_calib, variables, batches(), train=False,
                      hard=True)
    print(f"calibrated {quant_sanity(qcoll)} scales", flush=True)
    v_int8 = {**variables, "quant": qcoll}

    def dense_q4_map(m):
        def f(v, r, d):
            logits = m.apply(v, r, d, train=False, baseline=True,
                             low_res=True)
            return first_argmax(logits, axis=-1)
        return f

    runs = {
        "bf16_dense_q4": (make_scan_bench(dense_q4_map(model_bf16)),
                          (variables, rgb_p, depth_p)),
        "int8_dense_q4": (make_scan_bench(dense_q4_map(model_int8)),
                          (v_int8, rgb_p, depth_p)),
    }
    for name, (fn, args) in runs.items():
        fn(*args).block_until_ready()  # compile outside the trace
        d = f"/tmp/int8_decomp/{name}"
        with jax.profiler.trace(d):
            fn(*args).block_until_ready()
        cats, top, wms = device_breakdown(d, iters)
        leaf = sum(cats.values())
        print(f"\n== {name}: while {wms:.3f} ms/iter, "
              f"leaf-op sum {leaf:.3f} ==", flush=True)
        for c, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"  {c:<28} {ms:7.3f} ms/iter ({100*ms/leaf:5.1f}%)")
        print(f"  top {TOPK} events:")
        for n, ms in top:
            print(f"    {n:<40} {ms:7.3f} ms/iter")


if __name__ == "__main__":
    main()
