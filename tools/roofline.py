#!/usr/bin/env python
"""Per-stage HBM roofline for the flagship (VERDICT r2 item 3).

For each cumulative prefix of the dense forward (stems -> +gate -> +rgb_enc
-> +both_enc(+fuse+skips) -> +context -> full) this measures BOTH:

* wall time per iteration (interleaved scan timing, tools/_harness.py
  methodology), and
* XLA's own cost model on the SAME compiled scan executable
  (``compiled.cost_analysis()``: flops + HBM "bytes accessed"). NOTE:
  cost_analysis counts a while/scan body ONCE regardless of trip count
  (verified empirically: identical numbers for length 5/10/20), so the raw
  figures ARE per-iteration — no division by the scan length.

Stage deltas between consecutive prefixes give per-stage time / bytes /
flops. Each stage's floor is ``max(bytes/HBM_BW, flops/MXU_PEAK)``;
``measured/floor > ~1.3`` marks a stage that is NOT at its roofline and is
a concrete fusion/layout target (VERDICT r2 item 3). HBM_BW / MXU_PEAK are
the v5e datasheet numbers (819 GB/s, 197 bf16 TFLOP/s); the matmul anchor
measured in the same window calibrates how contended the absolute times are.

Also times dense_hard (the full gate-in-context forward) so the gate's
marginal cost can be compared against its marginal traffic (VERDICT item 5).

Writes a JSON blob (stages, floors, ratios) to stdout's last line for
archiving; human table on stderr.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

HBM_BW = 819e9          # v5e HBM bandwidth, bytes/s
MXU_PEAK = 197e12       # v5e bf16 peak FLOP/s (fp32 floors are optimistic)
ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "20"))
ROUNDS = int(os.environ.get("ROUNDS", "5"))
BS = int(os.environ.get("BS", "8"))


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
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, BS, h, w)
    rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    variables, _ = load_trained_gate(variables)
    model_bf16 = _flagship(h, w, dtype=jnp.bfloat16)

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    # --- cumulative prefixes of the dense (always-fuse) forward ---------
    def stems_only(v, r, d):
        return model.apply(v, r, d,
                           method=lambda m, r, d: m._stems(r, d, False)[0])

    def stems_gate(v, r, d):
        def f(m, r, d):
            rp, dp = m._stems(r, d, False)
            return m.gate_weights(rp, dp, hard=True)
        return model.apply(v, r, d, method=f)

    def thru_rgb_enc(v, r, d):
        def f(m, r, d):
            rp, dp = m._stems(r, d, False)
            wgt = m.gate_weights(rp, dp, hard=True)
            x = rp
            for i in (1, 2, 3, 4):
                x = getattr(m.encoder_rgb, f"layer{i}")(x, False)
            return jnp.sum(x) + jnp.sum(wgt)
        return model.apply(v, r, d, method=f)

    def _both_enc(m, r, d):
        rp, dp = m._stems(r, d, False)
        wgt = m.gate_weights(rp, dp, hard=True)
        fused = rp
        skips = []
        for i in (1, 2, 3):
            x = getattr(m.encoder_rgb, f"layer{i}")(fused, False)
            dp = getattr(m.encoder_depth, f"layer{i}")(dp, False)
            fused = m.fuse(i, x, dp)
            skips.append(m.skip(i, fused, False))
        x = m.encoder_rgb.layer4(fused, False)
        dp = m.encoder_depth.layer4(dp, False)
        return m.fuse(4, x, dp), skips, wgt

    def thru_both_enc(v, r, d):
        def f(m, r, d):
            fused, skips, wgt = _both_enc(m, r, d)
            return (jnp.sum(fused) + jnp.sum(wgt)
                    + sum(jnp.sum(s) for s in skips))
        return model.apply(v, r, d, method=f)

    def thru_context(v, r, d):
        def f(m, r, d):
            fused, skips, wgt = _both_enc(m, r, d)
            out = m.context_module(fused, False)
            return (jnp.sum(out) + jnp.sum(wgt)
                    + sum(jnp.sum(s) for s in skips))
        return model.apply(v, r, d, method=f)

    def full_baseline(v, r, d):
        return model.apply(v, r, d, train=False, baseline=True)

    def full_hard(v, r, d):
        return model.apply(v, r, d, train=False, hard=True)

    def full_bf16(v, r, d):
        return model_bf16.apply(v, r, d, train=False, baseline=True)

    candidates = {
        "stems": stems_only,
        "stems_gate": stems_gate,
        "thru_rgb_enc": thru_rgb_enc,
        "thru_both_enc": thru_both_enc,
        "thru_context": thru_context,
        "full_baseline": full_baseline,
        "full_hard": full_hard,
        "full_bf16": full_bf16,
    }
    runs = {k: make_scan_bench(f) for k, f in candidates.items()}

    # XLA cost model on the exact executables that get timed
    costs = {}
    for k, run in runs.items():
        ca = run.lower(variables, rgb, depth).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        # cost_analysis counts the scan body ONCE (trip-count-independent),
        # so these are already per-iteration figures
        costs[k] = {
            "flops": ca.get("flops", 0.0),
            "bytes": ca.get("bytes accessed", 0.0),
        }
        print(f"cost {k}: {costs[k]['flops']/1e9:.1f} GFLOP  "
              f"{costs[k]['bytes']/1e9:.2f} GB", file=sys.stderr, flush=True)

    meds = measure_interleaved(runs, nop, variables, rgb, depth,
                               rounds=ROUNDS)

    anchor = bench_mod.measure_matmul_anchor()

    chain = ["stems", "stems_gate", "thru_rgb_enc", "thru_both_enc",
             "thru_context", "full_baseline"]
    labels = ["stems", "gate", "rgb_encoder", "depth_enc+fuse+skips",
              "context", "decoder"]
    rows = []
    prev = {"t": 0.0, "flops": 0.0, "bytes": 0.0}
    hdr = (f"{'stage':<22}{'ms':>8}{'GB':>8}{'GFLOP':>9}{'GB/s':>8}"
           f"{'TFLOP/s':>9}{'floor ms':>10}{'x floor':>9}  bound")
    print("\n" + hdr, file=sys.stderr)
    for name, label in zip(chain, labels):
        t = meds[name]
        fl, by = costs[name]["flops"], costs[name]["bytes"]
        dt, dfl, dby = t - prev["t"], fl - prev["flops"], by - prev["bytes"]
        prev = {"t": t, "flops": fl, "bytes": by}
        mem_floor, cmp_floor = dby / HBM_BW, dfl / MXU_PEAK
        floor = max(mem_floor, cmp_floor)
        bound = "mem" if mem_floor >= cmp_floor else "mxu"
        rows.append({
            "stage": label, "ms": round(dt * 1e3, 3),
            "gbytes": round(dby / 1e9, 3), "gflop": round(dfl / 1e9, 2),
            "gb_per_s": round(dby / dt / 1e9, 1) if dt > 0 else None,
            "tflop_per_s": round(dfl / dt / 1e12, 1) if dt > 0 else None,
            "floor_ms": round(floor * 1e3, 3),
            "x_floor": round(dt / floor, 2) if floor > 0 else None,
            "bound": bound,
        })
        r = rows[-1]
        print(f"{label:<22}{r['ms']:>8.3f}{r['gbytes']:>8.2f}"
              f"{r['gflop']:>9.1f}{r['gb_per_s'] or 0:>8.1f}"
              f"{r['tflop_per_s'] or 0:>9.1f}{r['floor_ms']:>10.3f}"
              f"{r['x_floor'] or 0:>9.2f}  {bound}", file=sys.stderr)

    total = {
        "full_ms": round(meds["full_baseline"] * 1e3, 3),
        "full_gbytes": round(costs["full_baseline"]["bytes"] / 1e9, 3),
        "full_gflop": round(costs["full_baseline"]["flops"] / 1e9, 2),
        "full_x_floor": round(
            meds["full_baseline"]
            / max(costs["full_baseline"]["bytes"] / HBM_BW,
                  costs["full_baseline"]["flops"] / MXU_PEAK), 2),
        "bf16_ms": round(meds["full_bf16"] * 1e3, 3),
        "bf16_gbytes": round(costs["full_bf16"]["bytes"] / 1e9, 3),
        "bf16_x_floor": round(
            meds["full_bf16"]
            / max(costs["full_bf16"]["bytes"] / HBM_BW,
                  costs["full_bf16"]["flops"] / MXU_PEAK), 2),
        # gate marginal cost vs gate marginal traffic (VERDICT item 5)
        "hard_minus_base_ms": round(
            (meds["full_hard"] - meds["full_baseline"]) * 1e3, 3),
        "hard_extra_gbytes": round(
            (costs["full_hard"]["bytes"]
             - costs["full_baseline"]["bytes"]) / 1e9, 3),
        "hard_traffic_floor_ms": round(
            (costs["full_hard"]["bytes"] - costs["full_baseline"]["bytes"])
            / HBM_BW * 1e3, 3),
    }
    print(json.dumps({"stages": rows, "totals": total,
                      "anchor_tflops": anchor, "bs": BS, "iters": ITERS}))


if __name__ == "__main__":
    main()
