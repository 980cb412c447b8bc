#!/usr/bin/env python
"""Checkpoint-parity harness: import a reference PyTorch checkpoint and dump
deterministic fingerprints (logit checksums, hard-gate selections) so they can
be compared 1:1 against the reference implementation's outputs on the same
inputs — the acceptance test for "identical hard-gate selections" (BASELINE.md).

Usage:
    python tools/parity_check.py --ckpt ckpt_best.pth [--encoder resnet34 ...]

Emits JSON with per-input logit means/stds and the selected path per sample
for a deterministic set of synthetic inputs (seeded), plus optional real-data
fingerprints when --dataset_dir is provided.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from dynmm_tpu.utils.platform import maybe_force_cpu

    maybe_force_cpu()
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.models.esanet import ESANetConfig
    from dynmm_tpu.models.skip_gate import SkipGateESANet
    from dynmm_tpu.utils.torch_import import import_torch_checkpoint

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--encoder", default="resnet34")
    ap.add_argument("--encoder_block", default="NonBottleneck1D")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--num-classes", type=int, default=40)
    ap.add_argument("--n-samples", type=int, default=8)
    ap.add_argument("--fuse", default="SE-add")
    args = ap.parse_args()

    cfg = ESANetConfig(
        height=args.height, width=args.width, num_classes=args.num_classes,
        encoder_rgb=args.encoder, encoder_depth=args.encoder,
        encoder_block=args.encoder_block, fuse_depth_in_rgb_encoder=args.fuse,
    )
    model = SkipGateESANet(cfg)
    rgb0 = jnp.zeros((1, args.height, args.width, 3))
    depth0 = jnp.zeros((1, args.height, args.width, 1))
    variables = model.init(jax.random.PRNGKey(0), rgb0, depth0, train=False)
    params, state = import_torch_checkpoint(
        args.ckpt, variables["params"],
        {"batch_stats": variables["batch_stats"]},
    )
    variables = {"params": params, **state}

    fwd = jax.jit(
        lambda v, r, d: model.apply(v, r, d, train=False, hard=True,
                                    return_weight=True)
    )
    rng = np.random.default_rng(1234)
    records = []
    for i in range(args.n_samples):
        rgb = jnp.asarray(
            rng.standard_normal((1, args.height, args.width, 3)).astype(np.float32)
        )
        depth = jnp.asarray(
            rng.standard_normal((1, args.height, args.width, 1)).astype(np.float32)
        )
        out, w = fwd(variables, rgb, depth)
        out = np.asarray(out)
        records.append(
            {
                "sample": i,
                "path": int(np.asarray(w)[0].argmax()),
                "logit_mean": float(out.mean()),
                "logit_std": float(out.std()),
                "argmax_hist": np.bincount(
                    out.argmax(-1).reshape(-1), minlength=args.num_classes
                ).tolist(),
            }
        )
    print(json.dumps({"ckpt": args.ckpt, "records": records}, indent=2))


if __name__ == "__main__":
    main()
