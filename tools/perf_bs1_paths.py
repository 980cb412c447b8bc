"""bs=1 per-path serving table (VERDICT r3 item 3).

With a Python-int ``force_path``, ``forward_switch`` compiles a fully
STATIC path graph — the unit predict.py's ``--serve_mode switch_host``
dispatches. This probe measures, interleaved on-device:

  - the 5 static path programs (k=0..4), bf16 packed, q4 and full-res
  - the standalone gate program (stems + gate, argmax k) — phase 1
  - the in-graph cond ladder ``forward_switch`` (what --serve_mode switch
    runs) for the cond-boundary tax
  - dense bf16 packed (q4 + full) as the no-routing baseline

and prints the expected two-phase serving latency under a given path mix
(default: the recipe gate's 50/50 k=0/k=4): E[t] = t_gate + sum_k p_k *
t_path_k. Host dispatch between the two programs is not included — it is
µs-scale on a local host and unmeasurable over this tunnel (27 ms scalar
readback, CLAUDE.md).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "50"))
ROUNDS = int(os.environ.get("ROUNDS", "5"))
MIX = json.loads(os.environ.get("MIX_RATIOS", "[0.5, 0, 0, 0, 0.5]"))


def main():
    import bench as bench_mod
    from bench import (make_scan_bench, measure_interleaved,
                       setup_compilation_cache)

    bench_mod.SCAN_ITERS = ITERS
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from dynmm_tpu.models.resnet import space_to_depth_host

    h, w = 480, 640
    model16 = _flagship(h, w, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    rgb0 = rng.normal(size=(1, h, w, 3)).astype(np.float32)
    depth0 = rng.normal(size=(1, h, w, 1)).astype(np.float32)
    model32 = _flagship(h, w)
    variables = model32.init(jax.random.PRNGKey(0), jnp.asarray(rgb0),
                             jnp.asarray(depth0), train=False)
    rgb = jnp.asarray(space_to_depth_host(rgb0))
    depth = jnp.asarray(space_to_depth_host(depth0))

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    def gate_k(mdl, r, d):
        rs, ds = mdl._stems(r, d, False)
        wt = mdl.gate_weights(rs, ds, hard=True)
        return jnp.argmax(wt[0]).astype(jnp.int32)

    runs = {
        "dense_q4": make_scan_bench(
            lambda v, r, d: model16.apply(v, r, d, train=False,
                                          baseline=True, low_res=True)
            .astype(jnp.float32)),
        "dense_full": make_scan_bench(
            lambda v, r, d: model16.apply(v, r, d, train=False,
                                          baseline=True)
            .astype(jnp.float32)),
        "switch_cond_q4": make_scan_bench(
            lambda v, r, d: model16.apply(v, r, d, low_res=True,
                                          method=model16.forward_switch)
            .astype(jnp.float32)),
        "gate_only": make_scan_bench(
            lambda v, r, d: model16.apply(v, r, d, method=gate_k)
            .astype(jnp.float32)),
    }
    for k in range(5):
        runs[f"path{k}_q4"] = make_scan_bench(
            lambda v, r, d, k=k: model16.apply(
                v, r, d, force_path=k, low_res=True,
                method=model16.forward_switch).astype(jnp.float32))
    runs["path0_full"] = make_scan_bench(
        lambda v, r, d: model16.apply(
            v, r, d, force_path=0,
            method=model16.forward_switch).astype(jnp.float32))
    runs["path4_full"] = make_scan_bench(
        lambda v, r, d: model16.apply(
            v, r, d, force_path=4,
            method=model16.forward_switch).astype(jnp.float32))

    meds = measure_interleaved(runs, nop, variables, rgb, depth,
                               rounds=ROUNDS)
    anchor = bench_mod.measure_matmul_anchor()
    print(f"anchor: {anchor}", file=sys.stderr)
    for k, t in meds.items():
        print(f"bs=1 {k}: {t*1e3:.3f} ms", file=sys.stderr)

    t_gate = meds["gate_only"]
    exp_q4 = t_gate + sum(MIX[k] * meds[f"path{k}_q4"] for k in range(5))
    exp_full = t_gate + (MIX[0] * meds["path0_full"]
                         + (1 - MIX[0]) * meds["path4_full"])
    out = {k: round(v * 1e3, 3) for k, v in meds.items()}
    out["switch_host_expected_q4"] = round(exp_q4 * 1e3, 3)
    out["switch_host_expected_full_2path"] = round(exp_full * 1e3, 3)
    out["mix"] = MIX
    print(f"switch_host expected (mix {MIX}): q4 {exp_q4*1e3:.3f} ms "
          f"vs dense_q4 {meds['dense_q4']*1e3:.3f} ms", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
