#!/usr/bin/env python
"""Identify the dtype-invariant ~1.7 ms convert_reduce tail in the q4 chain.

tools/perf_int8_decomp.py: int8 dense packed q4 = 6.61 ms/iter of which
convert_reduce_fusion = 1.74 ms — identical event durations in the bf16
chain (0.769 + 0.544 + 0.14 + 0.12), i.e. a fixed tail that quantization
never touches. Candidates: the first_argmax two-pass on the (8,120,160,40)
logits, SE global pools, PPM context pools. This probe:

1. traces int8 q4 LOGITS (no argmax) vs int8 q4 CLASSMAP — the while-loop
   delta is the argmax tail's true cost;
2. dumps the compiled HLO of the classmap scan and prints every
   convert_reduce_fusion / *_reduce_fusion call site with its output
   shape, so the big events can be matched to ops by shape.

Usage:  python tools/perf_q4_tail.py        (real TPU)
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from perf_int8_decomp import device_breakdown  # noqa: E402


def main():
    import bench as bench_mod
    from bench import (BS, load_recipe_gate, make_recipe_eval_batch,
                       make_scan_bench, setup_compilation_cache)

    iters = bench_mod.SCAN_ITERS
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from dynmm_tpu.models.resnet import space_to_depth_host
    from dynmm_tpu.nn.layers import first_argmax
    from dynmm_tpu.utils.quantize import calibrate

    h, w = 480, 640
    model_calib = _flagship(h, w, quant="calib")
    model_int8 = _flagship(h, w, dtype=jnp.bfloat16, quant="int8")

    variables = _flagship(h, w).init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 1)), train=False)
    variables, ratios, _ = load_recipe_gate(variables)
    rgb0, depth0 = make_recipe_eval_batch(BS, h, w)
    rgb_p = jnp.asarray(space_to_depth_host(rgb0))
    depth_p = jnp.asarray(space_to_depth_host(depth0))

    def batches():
        for i in range(2):
            r0, d0 = make_recipe_eval_batch(BS, h, w, seed=100 + i)
            yield jnp.asarray(r0), jnp.asarray(d0)

    qcoll = calibrate(model_calib, variables, batches(), train=False,
                      hard=True)
    v_int8 = {**variables, "quant": qcoll}

    def q4_logits(v, r, d):
        return model_int8.apply(v, r, d, train=False, baseline=True,
                                low_res=True)

    def q4_map(v, r, d):
        return first_argmax(q4_logits(v, r, d), axis=-1)

    runs = {
        "int8_q4_logits": make_scan_bench(q4_logits),
        "int8_q4_classmap": make_scan_bench(q4_map),
    }
    whiles = {}
    for name, fn in runs.items():
        fn(v_int8, rgb_p, depth_p).block_until_ready()
        d = f"/tmp/q4_tail/{name}"
        with jax.profiler.trace(d):
            fn(v_int8, rgb_p, depth_p).block_until_ready()
        cats, top, wms = device_breakdown(d, iters)
        whiles[name] = wms
        print(f"== {name}: while {wms:.3f} ms/iter ==", flush=True)
        for c, ms in sorted(cats.items(), key=lambda kv: -kv[1])[:6]:
            print(f"  {c:<28} {ms:7.3f} ms/iter")
    print(f"\nargmax tail = {whiles['int8_q4_classmap'] - whiles['int8_q4_logits']:.3f} ms/iter\n",
          flush=True)

    # HLO call sites of the reduce fusions, with shapes
    hlo = runs["int8_q4_classmap"].lower(
        v_int8, rgb_p, depth_p).compile().as_text()
    pat = re.compile(r"^\s*%?(\S*reduce\S*fusion[.\d]*)\s*=\s*(\S+)\s+fusion",
                     re.M)
    for m in pat.finditer(hlo):
        print(f"{m.group(1):<40} -> {m.group(2)}")


if __name__ == "__main__":
    main()
