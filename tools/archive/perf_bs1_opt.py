#!/usr/bin/env python
"""bs=1 latency levers (round 3). perf_bs1_latency.py decomposed dense
bs=1 fp32 (3.1 ms vs ~0.4 ms byte floor) into three heavy spots:

  rgb stem 7x7 conv + copy   561 us   (C_in=3 starves the MXU at bs=1)
  depth stem 7x7 conv + copy 421 us
  decoder upsample2 + copy   526 us   (C=40 lane-padded to 128; +211 us
                                       layout copy of the 49 MB logits)
  conds (switch only)        ~380 us

Candidates (interleaved, medians):
  dense          status quo fp32
  dense_s2d      space-to-depth stem lowering (lost at bs=8; retry bs=1)
  dense_shift    logits upsamples via the 16-FMA shift form (vs dilated)
  dense_argmax   return the (1,H,W) class map instead of 49 MB logits —
                 the serving-realistic output; kills the final layout copy
  dense_s2d_am   s2d stem + argmax combined
"""

import json as js
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "50"))
ROUNDS = int(os.environ.get("ROUNDS", "5"))


def main():
    import bench as bench_mod
    from bench import (load_trained_gate, make_eval_batch, make_scan_bench,
                       measure_interleaved, setup_compilation_cache)

    bench_mod.SCAN_ITERS = ITERS
    setup_compilation_cache()
    import functools

    import jax
    import jax.numpy as jnp

    from dynmm_tpu.models.esanet import ESANetConfig
    from dynmm_tpu.models.skip_gate import SkipGateESANet
    from dynmm_tpu.nn import layers as L

    def flagship(**kw):
        cfg = ESANetConfig(
            height=480, width=640, num_classes=40,
            encoder_rgb="resnet34", encoder_depth="resnet34",
            encoder_block="NonBottleneck1D",
            channels_decoder=(512, 256, 128), nr_decoder_blocks=(3, 3, 3),
            fuse_depth_in_rgb_encoder="SE-add",
            upsampling="learned-3x3-zeropad", **kw,
        )
        return SkipGateESANet(cfg)

    model = flagship()
    model_s2d = flagship(s2d_stem=True)
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, 2, 480, 640)
    rgb, depth = jnp.asarray(rgb0[:1]), jnp.asarray(depth0[:1])
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
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

    runs = {
        "dense": make_scan_bench(dense(model)),
        "dense_s2d": make_scan_bench(dense(model_s2d)),
        "dense_shift": make_scan_bench(dense(model)),  # compiled under patch
        "dense_argmax": make_scan_bench(dense_am(model)),
        "dense_s2d_am": make_scan_bench(dense_am(model_s2d)),
    }

    # Compile dense_shift with the shift impl forced for the narrow (c<128)
    # logits upsamples (auto picks 'dilated' there); the wide decoder
    # upsamples already use 'shift' either way, so this flips exactly the
    # two logits upsamples.  Eager-compile under the patch, then restore.
    orig = L.learned3x3_zeropad_fused
    L.learned3x3_zeropad_fused = functools.partial(orig, impl="shift")
    try:
        runs["dense_shift"](variables, rgb, depth).block_until_ready()
    finally:
        L.learned3x3_zeropad_fused = orig

    meds = measure_interleaved(runs, nop, variables, rgb, depth,
                               rounds=ROUNDS)
    anchor = bench_mod.measure_matmul_anchor()
    print(f"anchor: {anchor}", file=sys.stderr)
    for k, t in meds.items():
        print(f"bs=1 {k}: {t*1e3:.3f} ms", file=sys.stderr)
    print(js.dumps({k: round(v * 1e3, 3) for k, v in meds.items()}))


if __name__ == "__main__":
    main()
