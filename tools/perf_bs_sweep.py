"""Batch-size sweep of the class-map serving chains (real TPU).

The headline ratios are all at bs=8. If the bf16 q4 chain carries more
fixed per-dispatch overhead than the dense fp32 full chain, larger batches
amortize it and the max-throughput-vs-max-throughput ratio (the honest
serving framing: each config serves at ITS best batch) beats the bs=8
ratio. This probe measures fps at bs 8/16/32 for:

  dense_fp32_full_map        — baseline chain (reference semantics)
  dense_bf16_packed_q4_map   — best known chain (BENCH_r03)
  routed_bf16_packed_q4_map  — routed variant, trained gate

Usage: python tools/perf_bs_sweep.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import (load_trained_gate, make_eval_batch,  # noqa: E402
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

    # init once at bs=8 (fully convolutional: params are bs-independent)
    rgb8, depth8 = make_eval_batch(rng, 8, h, w)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(rgb8), jnp.asarray(depth8),
        train=False)
    variables, ratios = load_trained_gate(variables)
    print("gate ratios:", ratios, flush=True)

    def dense_map(m, low):
        def f(v, r, d):
            logits = m.apply(v, r, d, train=False, baseline=True,
                             low_res=low)
            return first_argmax(logits, axis=-1)
        return f

    def routed_map(m, low, bs):
        def f(v, r, d):
            logits = m.apply(v, r, d, caps=(0, bs // 2, bs), low_res=low,
                             method=m.forward_routed_compact)
            return first_argmax(logits, axis=-1)
        return f

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    runs, args_map = {}, {}
    for bs in (8, 16, 32):
        rgb0, depth0 = make_eval_batch(rng, bs, h, w)
        full = (variables, jnp.asarray(rgb0), jnp.asarray(depth0))
        packed = (variables, jnp.asarray(space_to_depth_host(rgb0)),
                  jnp.asarray(space_to_depth_host(depth0)))
        runs[f"dense_fp32_full_map_bs{bs}"] = make_scan_bench(
            dense_map(model, False))
        args_map[f"dense_fp32_full_map_bs{bs}"] = full
        runs[f"dense_bf16_packed_q4_map_bs{bs}"] = make_scan_bench(
            dense_map(model_bf16, True))
        args_map[f"dense_bf16_packed_q4_map_bs{bs}"] = packed
        runs[f"routed_bf16_packed_q4_map_bs{bs}"] = make_scan_bench(
            routed_map(model_bf16, True, bs))
        args_map[f"routed_bf16_packed_q4_map_bs{bs}"] = packed

    meds = measure_interleaved(
        runs, nop, *args_map["dense_fp32_full_map_bs8"], args_map=args_map)
    base8 = meds["dense_fp32_full_map_bs8"] / 8
    for k, t in meds.items():
        bs = int(k.rsplit("bs", 1)[1])
        print(f"{k:<34} {t*1e3:7.2f} ms/batch ({bs/t:7.1f} fps) "
              f"per-sample vs dense_fp32_bs8 {base8/(t/bs):.3f}", flush=True)


if __name__ == "__main__":
    main()
