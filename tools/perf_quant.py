"""In-model int8 PTQ A/B on the flagship serving chains (real TPU).

The roofline says the serving chain is HBM-bound at ~1.06x its bf16 byte
floor (docs/DESIGN.md), so int8 activations+weights are the remaining
>=3x lever (VERDICT r4 item 1) — IF XLA lowers int8 convs onto the MXU and
fuses the requant chains into conv epilogues so inter-conv tensors land in
HBM as int8. tools/perf_int8.py probes the primitive; THIS probe measures
the whole serving chain:

  dense_fp32_full_map        — the baseline chain (reference semantics)
  dense_bf16_packed_q4_map   — best known float chain (BENCH_r03)
  int8_dense_packed_q4_map   — quantized chain (quant='int8', bf16 glue)
  int8_routed_packed_q4_map  — quantized + routed, shared (0,bs/2,bs) ladder
  int8_routed_sched_q4_map   — + per-stage capacity schedule (4 conds)
  int8_routed_strict_q4_map  — + strict capacity factor 1.25 (zero conds)

The first int8-routed measurement (8.99 ms, shared ladder) predates the
capacity schedules; the sched/strict rows answer whether routing itself
wins on the int8 chain once the cond tax is gone. Gate: the recipe asset
when present (bench parity), else gate_trained.

Calibration runs on-device first (one fp32 calib-graph compile).
Accuracy of the quantized chain is scored separately by
``eval.py --quant int8`` — this probe is throughput only.

Usage: python tools/perf_quant.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import (BS, load_recipe_gate, load_trained_gate,  # noqa: E402
                   make_eval_batch, make_recipe_eval_batch, make_scan_bench,
                   measure_interleaved, setup_compilation_cache)


def main():
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from dynmm_tpu.models.resnet import space_to_depth_host
    from dynmm_tpu.nn.layers import first_argmax
    from dynmm_tpu.utils.quantize import calibrate, quant_sanity

    print(f"devices: {jax.devices()}", flush=True)
    h, w = 480, 640
    model = _flagship(h, w)
    model_bf16 = _flagship(h, w, dtype=jnp.bfloat16)
    model_calib = _flagship(h, w, quant="calib")
    model_int8 = _flagship(h, w, dtype=jnp.bfloat16, quant="int8")

    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, BS, h, w)
    rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    variables, ratios, prov = load_recipe_gate(variables)
    if ratios is not None:
        gate_kind = "recipe"
        rgb0, depth0 = make_recipe_eval_batch(BS, h, w)
        rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)
    else:
        gate_kind = "trained"
        variables, ratios = load_trained_gate(variables)
    rgb_p = jnp.asarray(space_to_depth_host(rgb0))
    depth_p = jnp.asarray(space_to_depth_host(depth0))
    print(f"gate: {gate_kind}, ratios: {ratios}", flush=True)

    from dynmm_tpu.models.skip_gate import capacity_ladders
    sched = capacity_ladders(ratios, BS)
    strict = capacity_ladders(ratios, BS, capacity_factor=1.25)
    print(f"sched {sched}  strict {strict}", flush=True)

    # ---- on-device calibration (4 batches of the eval stream) ----------
    def batches():
        for i in range(4):
            if gate_kind == "recipe":
                r0, d0 = make_recipe_eval_batch(BS, h, w, seed=100 + i)
            else:
                r0, d0 = make_eval_batch(
                    np.random.default_rng(100 + i), BS, h, w)
            yield jnp.asarray(r0), jnp.asarray(d0)

    qcoll = calibrate(model_calib, variables, batches(),
                      train=False, hard=True)
    print(f"calibrated scales: {quant_sanity(qcoll)}", flush=True)
    v_int8 = {**variables, "quant": qcoll}

    def dense_map(m, low):
        def f(v, r, d):
            logits = m.apply(v, r, d, train=False, baseline=True,
                             low_res=low)
            return first_argmax(logits, axis=-1)
        return f

    def routed_map(m, low, caps=(0, BS // 2, BS), strict_caps=False):
        def f(v, r, d):
            logits = m.apply(v, r, d, caps=caps, low_res=low,
                             strict_caps=strict_caps,
                             method=m.forward_routed_compact)
            return first_argmax(logits, axis=-1)
        return f

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    runs = {
        "dense_fp32_full_map": make_scan_bench(dense_map(model, False)),
        "dense_bf16_packed_q4_map": make_scan_bench(
            dense_map(model_bf16, True)),
        "int8_dense_packed_q4_map": make_scan_bench(
            dense_map(model_int8, True)),
        "int8_routed_packed_q4_map": make_scan_bench(
            routed_map(model_int8, True)),
        "int8_routed_sched_q4_map": make_scan_bench(
            routed_map(model_int8, True, caps=sched)),
        "int8_routed_strict_q4_map": make_scan_bench(
            routed_map(model_int8, True, caps=strict, strict_caps=True)),
        "bf16_routed_strict_q4_map": make_scan_bench(
            routed_map(model_bf16, True, caps=strict, strict_caps=True)),
        "int8_dense_full_map": make_scan_bench(dense_map(model_int8, False)),
    }
    packed_f = (variables, rgb_p, depth_p)
    packed_q = (v_int8, rgb_p, depth_p)
    args_map = {
        "dense_bf16_packed_q4_map": packed_f,
        "int8_dense_packed_q4_map": packed_q,
        "int8_routed_packed_q4_map": packed_q,
        "int8_routed_sched_q4_map": packed_q,
        "int8_routed_strict_q4_map": packed_q,
        "bf16_routed_strict_q4_map": packed_f,
        "int8_dense_full_map": (v_int8, rgb, depth),
    }
    if os.environ.get("TRACE", "0") not in ("", "0"):
        # device-timeline truth (the scan wall pays routed graphs ~0.5-1 ms
        # of extra host dispatch over the tunnel — CLAUDE.md): trace the
        # scan while-loop per candidate, perf_r50_trace.while_ms reads it
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import bench as bench_mod
        import perf_r50_trace
        perf_r50_trace.ITERS = bench_mod.SCAN_ITERS  # while_ms divides by it
        while_ms = perf_r50_trace.while_ms

        for name in ("int8_dense_packed_q4_map", "int8_routed_packed_q4_map",
                     "int8_routed_sched_q4_map", "int8_routed_strict_q4_map",
                     "bf16_routed_strict_q4_map", "dense_bf16_packed_q4_map"):
            fn = runs[name]
            a = args_map.get(name, (variables, rgb, depth))
            fn(*a).block_until_ready()  # compile outside the trace
            d = f"/tmp/quant_traces/{name}"
            with __import__("jax").profiler.trace(d):
                fn(*a).block_until_ready()
            print(f"trace {name}: while = {while_ms(d):.3f} ms/iter",
                  flush=True)

    meds = measure_interleaved(runs, nop, variables, rgb, depth,
                               args_map=args_map)
    base = meds["dense_fp32_full_map"]
    for k, t in meds.items():
        print(f"{k:<28} {t*1e3:7.2f} ms/batch ({BS/t:7.1f} fps) "
              f"vs_base {base/t:.3f}", flush=True)


if __name__ == "__main__":
    main()
