#!/usr/bin/env python
"""Routing economics on the ResNet50 flagship variant (the reference's own
R50 config — per-path GFLOPs at model_skip_mod_globalgate.py:223: the depth
encoder is 24.7 of 57.0 GFLOPs and bottleneck blocks are MXU-dense, unlike
the R34-NBt1D whose skippable depth work costs <1.2 ms wall).

Candidates at bs=8 480×640 fp32: dense baseline, switch_batched forced to
each path k (real skipping), routed compact ladders."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from _harness import measure_all, scan_bench


def main():
    from bench import make_eval_batch, setup_compilation_cache
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.models.esanet import ESANetConfig
    from dynmm_tpu.models.skip_gate import SkipGateESANet

    cfg = ESANetConfig(
        height=480, width=640, num_classes=40,
        encoder_rgb="resnet50", encoder_depth="resnet50",
        encoder_block="Bottleneck",
        channels_decoder=(512, 256, 128), nr_decoder_blocks=(3, 3, 3),
        fuse_depth_in_rgb_encoder="SE-add",
        upsampling="learned-3x3-zeropad",
    )
    model = SkipGateESANet(cfg)
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, 8, 480, 640)
    rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)

    cands = {
        "dense_base": lambda v, r, d: model.apply(
            v, r, d, train=False, baseline=True),
        "dense_hard": lambda v, r, d: model.apply(
            v, r, d, train=False, hard=True),
        "force_k0": lambda v, r, d: model.apply(
            v, r, d, force_path=0, method=model.forward_switch_batched),
        "force_k2": lambda v, r, d: model.apply(
            v, r, d, force_path=2, method=model.forward_switch_batched),
        "force_k4": lambda v, r, d: model.apply(
            v, r, d, force_path=4, method=model.forward_switch_batched),
        "compact_048": lambda v, r, d: model.apply(
            v, r, d, caps=(0, 4, 8), method=model.forward_routed_compact),
    }
    runs, argsets = {}, {}
    for k, f in cands.items():
        runs[k] = scan_bench(lambda r, d, v, f=f: f(v, r, d))
        argsets[k] = (rgb, depth, variables)

    meds = measure_all(runs, argsets)
    base = meds["dense_base"]
    print("\nvs dense_base:")
    for k in cands:
        print(f"  {k:<14} {base/meds[k]:6.3f}  ({meds[k]*1e3:7.3f} ms)")


if __name__ == "__main__":
    main()
