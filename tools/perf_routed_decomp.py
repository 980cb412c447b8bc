#!/usr/bin/env python
"""Decompose routed-compact's overhead over dense, fp32 + bf16 (round-3
headline work): which part of the ~2-3.3 ms routing machinery is permutes,
gate, or cond-ladder?

Candidates (all interleaved so contention cancels):
  dense        — baseline forward, no gate
  dense_hard   — + gate (marginal = in-context gate cost)
  routed_full  — forward_routed_compact with caps=(bs,): gate + both stem
                 permutes + SE-mix + logits unpermute, but NO conds and NO
                 skipping (every stage at full capacity)
  routed       — shipped caps=(0, bs/2, bs): + cond ladders + real skipping
  permute3     — stems + the three big permutes alone (2 stem permutes +
                 logits-sized unpermute) to price data movement directly

Deltas: routed_full − dense_hard ≈ permutes+mix; routed − routed_full ≈
ladder overhead − skipping savings.

Also reconciles scan timing vs the device timeline: traces dense/dense_hard
once each and prints the while-loop durations (profile_gate.py showed
while-delta 0.55 ms vs scan-delta 1.6-1.9 ms — which is real?).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

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
    from dynmm_tpu.core.routing import permute_rows

    h, w = 480, 640
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, BS, h, w)
    rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)

    model32 = _flagship(h, w)
    variables = model32.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    variables, _ = load_trained_gate(variables)
    model16 = _flagship(h, w, dtype=jnp.bfloat16)

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    def permute3(model):
        def f(m, r, d):
            rp, dp = m._stems(r, d, False)
            wgt = m.gate_weights(rp, dp, hard=True)
            k = jnp.argmax(wgt, axis=-1).astype(jnp.int32)
            order = jnp.argsort(-k)
            inv = jnp.argsort(order)
            rs = permute_rows(rp, order)
            ds = permute_rows(dp, order)
            # logits-sized unpermute stand-in (H/2 x W/2 x 40 ~ the real one
            # is HxWx40; use the real size via broadcast from rs)
            fake = jnp.broadcast_to(
                rs[:, :, :, :1], rs.shape[:3] + (40,)
            ) * 1.0
            big = jax.image.resize(
                fake, (BS, h, w, 40), method="nearest")
            return jnp.sum(permute_rows(big, inv)) + jnp.sum(ds)
        return lambda v, r, d: model.apply(v, r, d, method=f)

    def cands_for(model, tag):
        return {
            f"dense_{tag}": make_scan_bench(
                lambda v, r, d: model.apply(v, r, d, train=False,
                                            baseline=True)),
            f"dense_hard_{tag}": make_scan_bench(
                lambda v, r, d: model.apply(v, r, d, train=False, hard=True)),
            f"routed_full_{tag}": make_scan_bench(
                lambda v, r, d: model.apply(
                    v, r, d, caps=(BS,),
                    method=model.forward_routed_compact)),
            f"routed_{tag}": make_scan_bench(
                lambda v, r, d: model.apply(
                    v, r, d, caps=(BS // 2, BS),
                    method=model.forward_routed_compact)),
            f"routed0_{tag}": make_scan_bench(
                lambda v, r, d: model.apply(
                    v, r, d, caps=(0, BS // 2, BS),
                    method=model.forward_routed_compact)),
            f"routedc_{tag}": make_scan_bench(
                lambda v, r, d: model.apply(
                    v, r, d, caps=(0, BS),
                    method=model.forward_routed_compact)),
        }

    runs = {}
    runs.update(cands_for(model32, "fp32"))
    runs.update(cands_for(model16, "bf16"))
    runs["permute3_fp32"] = make_scan_bench(permute3(model32))

    meds = measure_interleaved(runs, nop, variables, rgb, depth,
                               rounds=ROUNDS)
    anchor = bench_mod.measure_matmul_anchor()
    print(f"anchor: {anchor}", file=sys.stderr)

    for tag in ("fp32", "bf16"):
        d0 = meds[f"dense_{tag}"]
        dh = meds[f"dense_hard_{tag}"]
        rf = meds[f"routed_full_{tag}"]
        rr = meds[f"routed_{tag}"]
        print(f"\n[{tag}] dense {d0*1e3:.2f}  +gate {dh*1e3:.2f} "
              f"(+{(dh-d0)*1e3:.2f})  routed_full {rf*1e3:.2f} "
              f"(+{(rf-dh)*1e3:.2f} permutes+mix)  routed {rr*1e3:.2f} "
              f"({(rr-rf)*1e3:+.2f} ladder-skip net)  "
              f"caps(0,h,b) {meds[f'routed0_{tag}']*1e3:.2f}  "
              f"caps(0,b) {meds[f'routedc_{tag}']*1e3:.2f}", file=sys.stderr)
    p3 = meds["permute3_fp32"]
    print(f"permute3_fp32 (stems+gate+3 permutes+resize): {p3*1e3:.2f} ms",
          file=sys.stderr)

    # device-timeline reconciliation: trace one scan call of dense vs hard
    import gzip
    import json as js
    from collections import defaultdict

    def while_ms(trace_dir):
        base = os.path.join(trace_dir, "plugins", "profile")
        run_d = sorted(os.listdir(base))[-1]
        (path,) = [os.path.join(base, run_d, f)
                   for f in os.listdir(os.path.join(base, run_d))
                   if f.endswith(".trace.json.gz")]
        with gzip.open(path) as f:
            tr = js.load(f)
        dev_pids = {e["pid"] for e in tr["traceEvents"]
                    if e.get("ph") == "M" and e.get("name") == "process_name"
                    and "device:TPU" in e["args"].get("name", "")}
        agg = defaultdict(float)
        for e in tr["traceEvents"]:
            if e.get("ph") == "X" and e.get("pid") in dev_pids:
                if e["name"].startswith("while"):
                    agg[e["name"]] += e.get("dur", 0.0)
        return max(agg.values()) / ITERS / 1e3 if agg else float("nan")

    for name in ("dense_fp32", "dense_hard_fp32", "routed_fp32"):
        for rep in range(2):
            d = f"/tmp/decomp_traces/{name}_{rep}"
            with jax.profiler.trace(d):
                float(runs[name](variables, rgb, depth))
            print(f"trace {name} rep{rep}: while={while_ms(d):.3f} ms/iter",
                  file=sys.stderr)

    print(js.dumps({k: round(v * 1e3, 3) for k, v in meds.items()}))


if __name__ == "__main__":
    main()
