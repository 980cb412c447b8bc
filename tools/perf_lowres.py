"""Quarter-res class-map serving vs the full-res chain (real TPU).

The serving deliverable is a CLASS MAP, not logits. The full-res chain pays
the decoder's two 40-channel x2 learned upsamples (the largest single
activation write: 196 MB fp32 / 98 MB bf16 at bs=8 480x640) plus a
full-res argmax (first_argmax: +3.6 ms fp32, tools/perf_argmax_net.py).
``low_res=True`` argmaxes the native H/4 conv_out logits instead (16x fewer
bytes) and nearest-upsamples the uint8 map on the host (free: ~1.2 MB, done
in the loader thread like stem packing).

Candidates (one interleaved set, bs=8 480x640, trained gate, mixed batch):
  dense_fp32_full_map        — the reference's chain (baseline semantics)
  routed_bf16_packed_full_map— current shipped serving + argmax
  routed_bf16_packed_q4_map  — the quarter-res chain

Usage: python tools/perf_lowres.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import (BS, load_trained_gate, make_eval_batch,  # noqa: E402
                   make_scan_bench, measure_interleaved,
                   setup_compilation_cache)


def main():
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from dynmm_tpu.models.resnet import space_to_depth_host
    from dynmm_tpu.nn.layers import first_argmax

    h, w = 480, 640
    model = _flagship(h, w)
    model_bf16 = _flagship(h, w, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, BS, h, w)
    rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)
    rgb_p = jnp.asarray(space_to_depth_host(rgb0))
    depth_p = jnp.asarray(space_to_depth_host(depth0))
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    variables, ratios = load_trained_gate(variables)
    print("gate ratios:", ratios)

    def dense_map(m, low):
        def f(v, r, d):
            logits = m.apply(v, r, d, train=False, baseline=True,
                             low_res=low)
            return first_argmax(logits, axis=-1)
        return f

    def routed_map(m, low):
        def f(v, r, d):
            logits = m.apply(v, r, d, caps=(0, BS // 2, BS), low_res=low,
                             method=m.forward_routed_compact)
            return first_argmax(logits, axis=-1)
        return f

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    runs = {
        "dense_fp32_full_map": make_scan_bench(dense_map(model, False)),
        "routed_bf16_packed_full_map": make_scan_bench(
            routed_map(model_bf16, False)),
        "routed_bf16_packed_q4_map": make_scan_bench(
            routed_map(model_bf16, True)),
        "dense_bf16_packed_q4_map": make_scan_bench(
            dense_map(model_bf16, True)),
    }
    packed = (variables, rgb_p, depth_p)
    meds = measure_interleaved(
        runs, nop, variables, rgb, depth,
        args_map={k: packed for k in runs if "packed" in k},
    )
    base = meds["dense_fp32_full_map"]
    for k, t in meds.items():
        print(f"{k:<30} {t*1e3:7.2f} ms/batch ({BS/t:6.1f} fps) "
              f"vs_base {base/t:.3f}")


if __name__ == "__main__":
    main()
