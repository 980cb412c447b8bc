#!/usr/bin/env python
"""Logits-upsample tail probe (bs=8 bf16 packed). The bs=8 trace shows
upsample2 (learned-3x3-zeropad, c=40, 240x320->480x640) costs 1.25 ms —
~17x its byte floor — under the bf16 depthwise-dilated emitter
(EmitDepthwiseInputBatchInSublanes). Candidates, all in-model dense bf16
with host-packed stems, interleaved:

  base        status quo ('dilated' for c<128)
  shift       force the 16-FMA shift form for the narrow upsamples
  unfused     nearest-x2 + plain depthwise conv (materialized intermediate)
  fp32tail    run the narrow (c<128) upsamples in fp32 inside the bf16 net
  argmax      status quo but return the argmax class map (serving output)
"""

import functools
import json as js
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "20"))
ROUNDS = int(os.environ.get("ROUNDS", "5"))


def main():
    import bench as bench_mod
    from bench import (load_trained_gate, make_eval_batch, make_scan_bench,
                       measure_interleaved, setup_compilation_cache)

    bench_mod.SCAN_ITERS = ITERS
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from dynmm_tpu.models.resnet import space_to_depth_host
    from dynmm_tpu.nn import layers as L

    h, w = 480, 640
    model16 = _flagship(h, w, dtype=jnp.bfloat16)
    model = _flagship(h, w)
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, 8, h, w)
    rgb_p = jnp.asarray(space_to_depth_host(rgb0))
    depth_p = jnp.asarray(space_to_depth_host(depth0))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(rgb0),
                           jnp.asarray(depth0), train=False)
    variables, _ = load_trained_gate(variables)

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    def dense(m):
        return lambda v, r, d: m.apply(v, r, d, train=False, baseline=True)

    def dense_am(m):
        return lambda v, r, d: jnp.argmax(
            m.apply(v, r, d, train=False, baseline=True), axis=-1
        ).astype(jnp.int32)

    orig = L.learned3x3_zeropad_fused

    def fp32_narrow(x, k3, bias, impl="auto"):
        if x.shape[-1] < 128:
            out = orig(x.astype(jnp.float32), k3.astype(jnp.float32),
                       bias.astype(jnp.float32), impl=impl)
            return out
        return orig(x, k3, bias, impl=impl)

    runs = {
        "base": make_scan_bench(dense(model16)),
        "shift": make_scan_bench(dense(model16)),
        "fp32tail": make_scan_bench(dense(model16)),
        "argmax": make_scan_bench(dense_am(model16)),
        "argmax_fp32tail": make_scan_bench(dense_am(model16)),
    }
    args = (variables, rgb_p, depth_p)

    # eager-compile the patched variants under their patches
    L.learned3x3_zeropad_fused = functools.partial(orig, impl="shift")
    try:
        runs["shift"](*args).block_until_ready()
    finally:
        L.learned3x3_zeropad_fused = orig
    L.learned3x3_zeropad_fused = fp32_narrow
    try:
        runs["fp32tail"](*args).block_until_ready()
        runs["argmax_fp32tail"](*args).block_until_ready()
    finally:
        L.learned3x3_zeropad_fused = orig

    meds = measure_interleaved(runs, nop, *args, rounds=ROUNDS)
    anchor = bench_mod.measure_matmul_anchor()
    print(f"anchor: {anchor}", file=sys.stderr)
    for k, t in meds.items():
        print(f"bs=8 bf16 packed {k}: {t*1e3:.3f} ms", file=sys.stderr)
    print(js.dumps({k: round(v * 1e3, 3) for k, v in meds.items()}))


if __name__ == "__main__":
    main()
