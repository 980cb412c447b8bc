#!/usr/bin/env python
"""Contention-robust comparison of the routing strategies.

Absolute step times on this chip swing ~2x between (and within!) processes
(dense baseline measured 13.9 / 11.6 / 8.8 / 5.7 ms across the day), so
single-shot timings are untrustworthy. This probe:

  * round-robins R reps over ALL candidates (so drift hits everyone),
  * brackets every rep with a fixed matmul ANCHOR and divides out the
    anchor's relative slowdown (multiplicative-contention model),
  * reports per-candidate MEDIAN (and raw spread).

Ratios between candidates (e.g. routed/baseline) are the quantities to
trust.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "20"))
ROUNDS = int(os.environ.get("ROUNDS", "5"))


def main():
    from bench import (make_eval_batch, make_scan_bench, measure,
                       load_trained_gate, setup_compilation_cache)
    import bench as bench_mod

    bench_mod.SCAN_ITERS = ITERS

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    h, w = 480, 640
    bs = 8
    model = _flagship(h, w)
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, bs, h, w)
    rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    variables, _ = load_trained_gate(variables)

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    # anchor: 2048^3 matmul chain, ~17.2 GFLOP/iter
    xa = jnp.asarray(rng.standard_normal((2048, 2048)).astype(np.float32))

    @jax.jit
    def anchor(x):
        def body(c, _):
            return jnp.tanh(c @ x), ()
        c, _ = jax.lax.scan(body, x, None, length=10)
        return jnp.sum(c[0, 0])

    @jax.jit
    def anchor_nop(x):
        return jnp.sum(x[0, 0])

    def time_anchor():
        t0 = time.perf_counter(); float(anchor(xa))
        tot = time.perf_counter() - t0
        t0 = time.perf_counter(); float(anchor_nop(xa))
        ov = time.perf_counter() - t0
        return max(tot - ov, 1e-9) / 10

    candidates = {
        "dense_baseline": lambda v, r, d: model.apply(
            v, r, d, train=False, baseline=True),
        "dense_hard": lambda v, r, d: model.apply(
            v, r, d, train=False, hard=True),
        "switch_batched_dyn": lambda v, r, d: model.apply(
            v, r, d, method=model.forward_switch_batched),
        "routed_compact": lambda v, r, d: model.apply(
            v, r, d, method=model.forward_routed_compact),
        "force_k0": lambda v, r, d: model.apply(
            v, r, d, force_path=0, method=model.forward_switch_batched),
        "force_k3": lambda v, r, d: model.apply(
            v, r, d, force_path=3, method=model.forward_switch_batched),
        "force_k4": lambda v, r, d: model.apply(
            v, r, d, force_path=4, method=model.forward_switch_batched),
    }
    runs = {k: make_scan_bench(f) for k, f in candidates.items()}

    # compile everything first
    for k, run in runs.items():
        float(run(variables, rgb, depth))
        print(f"compiled {k}", flush=True)
    float(nop(variables, rgb, depth))
    float(anchor(xa)); float(anchor_nop(xa))

    raw = {k: [] for k in runs}
    corr = {k: [] for k in runs}
    anchors = []
    names = list(runs)
    a_best = np.inf
    for rnd in range(ROUNDS):
        order = names[rnd % len(names):] + names[:rnd % len(names)]
        for k in order:
            a1 = time_anchor()
            t0 = time.perf_counter(); float(runs[k](variables, rgb, depth))
            tot = time.perf_counter() - t0
            t0 = time.perf_counter(); float(nop(variables, rgb, depth))
            ov = time.perf_counter() - t0
            a2 = time_anchor()
            a = min(a1, a2)
            anchors.append(a)
            a_best = min(a_best, a)
            t = max(tot - ov, 1e-9) / ITERS
            raw[k].append(t)
            corr[k].append((t, a))
        print(f"round {rnd} done (anchor {np.median(anchors)*1e3:.3f} ms)",
              flush=True)

    print(f"\nanchor best {a_best*1e3:.3f} ms, median "
          f"{np.median(anchors)*1e3:.3f} ms, worst "
          f"{max(anchors)*1e3:.3f} ms  (17.18 GFLOP => "
          f"{17.18/ (a_best*1e3):.0f} TFLOP/s best)")
    print(f"{'candidate':<22} {'median':>9} {'min':>9} {'max':>9} "
          f"{'corrected-med':>14}")
    base_med = None
    for k in names:
        r = np.array(raw[k])
        c = np.array([t * (a_best / a) for (t, a) in corr[k]])
        med = np.median(c)
        if k == "dense_baseline":
            base_med = med
        print(f"{k:<22} {np.median(r)*1e3:9.3f} {r.min()*1e3:9.3f} "
              f"{r.max()*1e3:9.3f} {med*1e3:14.3f}", flush=True)
    print(f"\nvs_baseline (corrected medians):")
    for k in names:
        c = np.median([t * (a_best / a) for (t, a) in corr[k]])
        print(f"  {k:<22} {base_med / c:6.3f}")


if __name__ == "__main__":
    main()
