#!/usr/bin/env python
"""Device-level profile of the gate's in-context overhead (VERDICT r2
item 5): ``jax.profiler.trace`` DOES capture real TPU op timings over the
axon tunnel (the /device:TPU:0 lane carries per-fusion events), so instead
of inferring from HLO multiset diffs (tools/hlo_gate_diff.py) we can read
where dense_hard's extra ~1.1 ms over dense_base actually goes.

Method: trace one scan-timed call of each candidate, aggregate device-lane
event durations per op name, print the per-op diff sorted by |delta|. Ops
only in dense_hard = the gate's own compute; shared ops that got SLOWER =
scheduling/fusion perturbation (the unexplained residual).

Usage: python tools/profile_gate.py [out_dir]
"""

import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "10"))
BS = int(os.environ.get("BS", "8"))


def device_op_times(trace_dir):
    """{op_name: total_us} from the /device:TPU lane of the newest trace."""
    base = os.path.join(trace_dir, "plugins", "profile")
    run = sorted(os.listdir(base))[-1]
    (path,) = [
        os.path.join(base, run, f)
        for f in os.listdir(os.path.join(base, run))
        if f.endswith(".trace.json.gz")
    ]
    with gzip.open(path) as f:
        tr = json.load(f)
    dev_pids = {
        e["pid"]
        for e in tr["traceEvents"]
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "device:TPU" in e["args"].get("name", "")
    }
    agg = defaultdict(float)
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            agg[e["name"]] += e.get("dur", 0.0)
    return dict(agg)


def main():
    import bench as bench_mod
    from bench import (load_trained_gate, make_eval_batch, make_scan_bench,
                       setup_compilation_cache)

    bench_mod.SCAN_ITERS = ITERS
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gate_traces"
    h, w = 480, 640
    model = _flagship(h, w)
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, BS, h, w)
    rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    variables, _ = load_trained_gate(variables)

    runs = {
        "base": make_scan_bench(
            lambda v, r, d: model.apply(v, r, d, train=False, baseline=True)),
        "hard": make_scan_bench(
            lambda v, r, d: model.apply(v, r, d, train=False, hard=True)),
    }
    for k, run in runs.items():
        float(run(variables, rgb, depth))  # compile + warm
        print(f"compiled {k}", flush=True)

    times = {}
    for k, run in runs.items():
        d = os.path.join(out_root, k)
        with jax.profiler.trace(d):
            float(run(variables, rgb, depth))
        times[k] = device_op_times(d)
        tot = sum(times[k].values())
        print(f"{k}: {len(times[k])} device ops, "
              f"{tot/ITERS/1e3:.3f} ms/iter total", flush=True)

    ops = sorted(set(times["base"]) | set(times["hard"]),
                 key=lambda o: -(abs(times["hard"].get(o, 0.0)
                                     - times["base"].get(o, 0.0))))
    print(f"\n{'op':<64}{'base us':>10}{'hard us':>10}{'delta':>9}")
    shown = 0
    for o in ops:
        b = times["base"].get(o, 0.0) / ITERS
        hh = times["hard"].get(o, 0.0) / ITERS
        if abs(hh - b) < 3 and shown > 10:
            continue
        tag = "" if o in times["base"] else "  [gate-only]"
        print(f"{o[:64]:<64}{b:>10.1f}{hh:>10.1f}{hh-b:>9.1f}{tag}")
        shown += 1
        if shown > 45:
            break
    gate_only = sum(t for o, t in times["hard"].items()
                    if o not in times["base"]) / ITERS
    slower = sum(times["hard"][o] - times["base"][o]
                 for o in times["hard"] if o in times["base"]
                 and times["hard"][o] > times["base"][o]) / ITERS
    print(f"\ngate-only ops: {gate_only/1e3:.3f} ms/iter; shared ops net "
          f"slower by {slower/1e3:.3f} ms/iter")


if __name__ == "__main__":
    main()
