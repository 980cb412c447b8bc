#!/usr/bin/env python
"""In-model follow-up after tools/perf_dispatch.py's micro findings:

  * stem kernel now default-on for SE-add models — fresh stems/baseline cost
  * the in-model gate overhead mystery (standalone conv1 = 0.13 ms but the
    decomposition showed +1.08 ms): measure the marginal gate cost in a
    realistic context (stems + layer1 with and without the gate)
  * routed_compact with dot_general permutes and cond ladders (the 44 ms
    pathology was take/reshape permutes, now 0.03 ms each)
  * batch-scaling of the dense baseline (bs 8/16/32 — VERDICT weak #4)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from _harness import ITERS, measure_all, scan_bench


def main():
    from bench import (make_eval_batch, load_trained_gate,
                       setup_compilation_cache)
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    h, w = 480, 640
    model = _flagship(h, w)
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, 8, h, w)
    rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    variables, _ = load_trained_gate(variables)

    def stems(m, r, d):
        return m._stems(r, d, False)[0]

    def stems_l1(m, r, d):
        rp, dp = m._stems(r, d, False)
        return m.encoder_rgb.layer1(rp, False)

    def stems_l1_gate(m, r, d):
        rp, dp = m._stems(r, d, False)
        wgt = m.gate_weights(rp, dp, hard=True)
        x = m.encoder_rgb.layer1(rp, False)
        return x + jnp.sum(wgt) * 1e-30

    cands = {
        "stems": lambda v, r, d: model.apply(v, r, d, method=stems),
        "stems_l1": lambda v, r, d: model.apply(v, r, d, method=stems_l1),
        "stems_l1_gate": lambda v, r, d: model.apply(
            v, r, d, method=stems_l1_gate),
        "dense_base": lambda v, r, d: model.apply(
            v, r, d, train=False, baseline=True),
        "dense_hard": lambda v, r, d: model.apply(
            v, r, d, train=False, hard=True),
        "switch_batched": lambda v, r, d: model.apply(
            v, r, d, method=model.forward_switch_batched),
        "compact_08": lambda v, r, d: model.apply(
            v, r, d, caps=(0, 8), method=model.forward_routed_compact),
        "compact_048": lambda v, r, d: model.apply(
            v, r, d, caps=(0, 4, 8), method=model.forward_routed_compact),
    }
    runs, argsets = {}, {}
    for k, f in cands.items():
        runs[k] = scan_bench(lambda r, d, v, f=f: f(v, r, d))
        argsets[k] = (rgb, depth, variables)

    # batch scaling of the dense baseline
    for bs in (16, 32):
        r0, d0 = make_eval_batch(rng, bs, h, w)
        runs[f"dense_bs{bs}"] = scan_bench(
            lambda r, d, v: model.apply(v, r, d, train=False, baseline=True))
        argsets[f"dense_bs{bs}"] = (
            jnp.asarray(r0), jnp.asarray(d0), variables)

    meds = measure_all(runs, argsets)

    base = meds["dense_base"]
    print("\nderived:")
    print(f"  gate marginal in-context   {(meds['stems_l1_gate']-meds['stems_l1'])*1e3:7.3f} ms")
    print(f"  hard-mix+gate vs baseline  {(meds['dense_hard']-base)*1e3:7.3f} ms")
    for k in ("switch_batched", "compact_08", "compact_048"):
        print(f"  {k:<26} vs_baseline {base/meds[k]:.3f}")
    print(f"  per-sample ms: bs8 {base/8*1e3:.3f}  "
          f"bs16 {meds['dense_bs16']/16*1e3:.3f}  "
          f"bs32 {meds['dense_bs32']/32*1e3:.3f}")


if __name__ == "__main__":
    main()
