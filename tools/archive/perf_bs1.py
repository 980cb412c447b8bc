#!/usr/bin/env python
"""Latency-mode comparison: dense baseline vs gate-routed forward_switch
across small batch sizes (interleaved reps, raw medians). Establishes where
input-dependent routing beats the static model on v5e — cond operand traffic
scales with batch while skipped work stays proportional, so small batches
are routing's regime (the reference evaluates at bs=1).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "30"))
ROUNDS = int(os.environ.get("ROUNDS", "5"))


def main():
    from bench import (make_eval_batch, load_trained_gate,
                       setup_compilation_cache)
    import bench as bench_mod

    bench_mod.SCAN_ITERS = ITERS
    from bench import make_scan_bench

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    h, w = 480, 640
    model = _flagship(h, w)
    rng = np.random.default_rng(0)
    rgb8, depth8 = make_eval_batch(rng, 8, h, w)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(rgb8),
                           jnp.asarray(depth8), train=False)
    variables, _ = load_trained_gate(variables)

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    cands = {}
    args = {}
    for bs in (1, 2, 4):
        rgb = jnp.asarray(rgb8[:bs])
        depth = jnp.asarray(depth8[:bs])
        args[bs] = (rgb, depth)
        cands[f"bs{bs}_baseline"] = make_scan_bench(
            lambda v, r, d: model.apply(v, r, d, train=False, baseline=True))
        cands[f"bs{bs}_routed"] = make_scan_bench(
            lambda v, r, d: model.apply(v, r, d,
                                        method=model.forward_switch))
        # routed easy/hard inputs: all-uninformative vs all-informative depth
        cands[f"bs{bs}_routed_k0in"] = cands[f"bs{bs}_routed"]

    runs = []
    for bs in (1, 2, 4):
        rgb, depth = args[bs]
        easy = jnp.asarray(
            0.02 * np.random.default_rng(7).standard_normal(
                depth.shape).astype(np.float32))
        runs.append((f"bs{bs}_baseline", cands[f"bs{bs}_baseline"],
                     (variables, rgb, depth)))
        runs.append((f"bs{bs}_routed_mixed", cands[f"bs{bs}_routed"],
                     (variables, rgb, depth)))
        runs.append((f"bs{bs}_routed_easy", cands[f"bs{bs}_routed"],
                     (variables, rgb, easy)))

    for name, run, a in runs:
        float(run(*a))
        print(f"compiled {name}", flush=True)
    for bs in (1, 2, 4):
        float(nop(*runs[0][2]))

    raw = {name: [] for name, _, _ in runs}
    for rnd in range(ROUNDS):
        for name, run, a in runs:
            t0 = time.perf_counter(); float(run(*a))
            tot = time.perf_counter() - t0
            t0 = time.perf_counter(); float(nop(*a))
            ov = time.perf_counter() - t0
            raw[name].append(max(tot - ov, 1e-9) / ITERS)
        print(f"round {rnd} done", flush=True)

    print(f"\n{'candidate':<22} {'median':>9} {'min':>9} {'max':>9}")
    meds = {}
    for name in raw:
        r = np.array(raw[name])
        meds[name] = np.median(r)
        print(f"{name:<22} {np.median(r)*1e3:9.3f} {r.min()*1e3:9.3f} "
              f"{r.max()*1e3:9.3f}")
    for bs in (1, 2, 4):
        b = meds[f"bs{bs}_baseline"]
        print(f"bs={bs}: routed_mixed vs_baseline "
              f"{b/meds[f'bs{bs}_routed_mixed']:.3f}, routed_easy "
              f"{b/meds[f'bs{bs}_routed_easy']:.3f}")


if __name__ == "__main__":
    main()
