#!/usr/bin/env python
"""Fresh stage decomposition of the flagship (post upsample-fix), using the
contention-robust interleaved method of tools/perf_clean.py: round-robin
reps, matmul anchor normalization, medians. Differences between candidates
(stage costs) are the quantities to trust.

Candidates build cumulative prefixes of the baseline forward so stage costs
fall out as differences:
    stems -> +gate -> +rgb_enc -> +both_enc(+fuse+skips) -> full
plus the SE-fuse0 micro cell, a bf16 full baseline, and gate micro variants.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "20"))
ROUNDS = int(os.environ.get("ROUNDS", "5"))
BS = int(os.environ.get("BS", "8"))


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

    # --- cumulative prefixes of the baseline (always-fuse) forward ---
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

    def thru_both_enc(v, r, d):
        def f(m, r, d):
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
            fused = m.fuse(4, x, dp)
            return (jnp.sum(fused) + jnp.sum(wgt)
                    + sum(jnp.sum(s) for s in skips))
        return model.apply(v, r, d, method=f)

    def full_baseline(v, r, d):
        return model.apply(v, r, d, train=False, baseline=True)

    def full_bf16(v, r, d):
        return model_bf16.apply(v, r, d, train=False, baseline=True)

    def routed_compact(v, r, d):
        return model.apply(v, r, d, method=model.forward_routed_compact)

    # gate micro: stems + ONLY conv1 of the gate (vs stems_gate isolates the
    # rest of the gate head)
    def stems_gateconv1(v, r, d):
        def f(m, r, d):
            rp, dp = m._stems(r, d, False)
            gp = v["params"]["gate_layer"]["conv1"]
            k = gp["kernel"]
            c = rp.shape[-1]
            dn = jax.lax.conv_dimension_numbers(
                rp.shape, k[:, :, :c].shape, ("NHWC", "HWIO", "NHWC"))
            x = (jax.lax.conv_general_dilated(
                    rp, k[:, :, :c], (2, 2), ((0, 0), (0, 0)),
                    dimension_numbers=dn)
                 + jax.lax.conv_general_dilated(
                    dp, k[:, :, c:], (2, 2), ((0, 0), (0, 0)),
                    dimension_numbers=dn))
            return jnp.sum(x)
        return model.apply(v, r, d, method=f)

    candidates = {
        "stems": stems_only,
        "stems_gateconv1": stems_gateconv1,
        "stems_gate": stems_gate,
        "thru_rgb_enc": thru_rgb_enc,
        "thru_both_enc": thru_both_enc,
        "full_baseline": full_baseline,
        "full_bf16": full_bf16,
        "routed_compact": routed_compact,
    }
    runs = {k: make_scan_bench(f) for k, f in candidates.items()}

    for k, run in runs.items():
        t0 = time.time()
        float(run(variables, rgb, depth))
        print(f"compiled {k} ({time.time()-t0:.0f}s)", flush=True)
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
        print(f"round {rnd} done", flush=True)

    a_best = min(anchors)
    use_anchor = a_best > 2e-4  # below this the anchor drowned in tunnel noise
    meds = {}
    print(f"\nanchor best {a_best*1e3:.3f} ms  "
          f"({'using' if use_anchor else 'ignoring'} anchor correction)")
    print(f"{'candidate':<20} {'raw-med':>9} {'used':>10}")
    for k in names:
        if use_anchor:
            meds[k] = np.median([t * (a_best / a) for (t, a) in corr[k]])
        else:
            meds[k] = np.median(raw[k])
        print(f"{k:<20} {np.median(raw[k])*1e3:9.3f} {meds[k]*1e3:10.3f}",
              flush=True)

    print("\nstage costs (corrected, ms):")
    print(f"  stems                 {meds['stems']*1e3:7.3f}")
    print(f"  gate conv1            {(meds['stems_gateconv1']-meds['stems'])*1e3:7.3f}")
    print(f"  gate rest             {(meds['stems_gate']-meds['stems_gateconv1'])*1e3:7.3f}")
    print(f"  rgb encoder           {(meds['thru_rgb_enc']-meds['stems_gate'])*1e3:7.3f}")
    print(f"  depth enc+fuse+skips  {(meds['thru_both_enc']-meds['thru_rgb_enc'])*1e3:7.3f}")
    print(f"  context+decoder       {(meds['full_baseline']-meds['thru_both_enc'])*1e3:7.3f}")
    print(f"  full baseline         {meds['full_baseline']*1e3:7.3f}")
    print(f"  full bf16             {meds['full_bf16']*1e3:7.3f}")
    print(f"  routed compact        {meds['routed_compact']*1e3:7.3f}  "
          f"(vs_baseline {meds['full_baseline']/meds['routed_compact']:.3f})")


if __name__ == "__main__":
    main()
