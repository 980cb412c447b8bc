#!/usr/bin/env python
"""bs=1 latency analysis (round 3): the routed switch measures 2.4-5.3 ms
against a ~0.3 GB byte floor (~0.4 ms) — find where bs=1 time goes.

Hypothesis: op-count-bound — the graph has ~2.8k device ops; at small
shapes each op's fixed issue overhead dominates. Candidates (interleaved):
dense fp32/bf16, switch routed fp32/bf16, forced k0. Plus a device trace
of switch fp32: #ops, total device-busy, busy/op histogram.
"""

import gzip
import json as js
import os
import sys
from collections import defaultdict

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

    h, w = 480, 640
    model = _flagship(h, w)
    model16 = _flagship(h, w, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, 2, h, w)
    rgb, depth = jnp.asarray(rgb0[:1]), jnp.asarray(depth0[:1])
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    variables, _ = load_trained_gate(variables)

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    runs = {
        "dense_fp32": make_scan_bench(
            lambda v, r, d: model.apply(v, r, d, train=False, baseline=True)),
        "dense_bf16": make_scan_bench(
            lambda v, r, d: model16.apply(v, r, d, train=False,
                                          baseline=True)),
        "switch_fp32": make_scan_bench(
            lambda v, r, d: model.apply(v, r, d,
                                        method=model.forward_switch)),
        "switch_bf16": make_scan_bench(
            lambda v, r, d: model16.apply(v, r, d,
                                          method=model16.forward_switch)),
        "force_k0_fp32": make_scan_bench(
            lambda v, r, d: model.apply(v, r, d, force_path=0,
                                        method=model.forward_switch)),
    }
    meds = measure_interleaved(runs, nop, variables, rgb, depth,
                               rounds=ROUNDS)
    anchor = bench_mod.measure_matmul_anchor()
    print(f"anchor: {anchor}", file=sys.stderr)
    for k, t in meds.items():
        print(f"bs=1 {k}: {t*1e3:.3f} ms", file=sys.stderr)

    d = "/tmp/bs1_trace"
    with jax.profiler.trace(d):
        float(runs["switch_fp32"](variables, rgb, depth))
    base = os.path.join(d, "plugins", "profile")
    run_d = sorted(os.listdir(base))[-1]
    (path,) = [os.path.join(base, run_d, f)
               for f in os.listdir(os.path.join(base, run_d))
               if f.endswith(".trace.json.gz")]
    with gzip.open(path) as f:
        tr = js.load(f)
    dev_pids = {e["pid"] for e in tr["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "device:TPU" in e["args"].get("name", "")}
    leaf = defaultdict(float)
    whiles = []
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            if e["name"].startswith("while"):
                whiles.append(e["dur"])
            elif not e["name"].startswith("jit_"):
                leaf[e["name"]] += e.get("dur", 0.0)
    busy = sum(leaf.values()) / ITERS
    wl = max(whiles) / ITERS if whiles else float("nan")
    durs = sorted((v / ITERS for v in leaf.values()), reverse=True)
    print(f"switch bs=1: {len(leaf)} leaf ops, device-busy "
          f"{busy/1e3:.3f} ms/iter, while {wl/1e3:.3f} ms/iter "
          f"(gaps {max(wl-busy,0)/1e3:.3f})", file=sys.stderr)
    print(f"top-10 ops (us/iter): {[round(x,1) for x in durs[:10]]}",
          file=sys.stderr)
    print(f"ops >10us: {sum(1 for x in durs if x > 10)}; "
          f"<2us: {sum(1 for x in durs if x < 2)} "
          f"(sum {sum(x for x in durs if x < 2)/1e3:.3f} ms)",
          file=sys.stderr)

    print(js.dumps({k: round(v * 1e3, 3) for k, v in meds.items()}))


if __name__ == "__main__":
    main()
