"""Weight-initialization utilities.

``apply_he_init`` reproduces the reference's ``--he_init`` pass
(``build_model.py:152-178``): Kaiming-normal (fan_out, relu) re-init of conv
and dense kernels, except output layers (out_channels == n_classes),
SE-block convs (followed by sigmoid) and depthwise convs (the
bilinear-initialized learned upsampling); BN stays at scale 1 / bias 0.

``import_imagenet_resnet`` loads a locally-downloaded torchvision ResNet
state_dict into an encoder subtree, summing conv1 weights for 1-channel
depth encoders (resnet.py:404-407, 439-442); ``import_nbt1d_encoder``
handles the ESANet ``r34_NBt1D.pth``-style checkpoints whose keys carry an
``encoder.`` prefix (resnet.py:469-509).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def apply_he_init(params, rng, n_classes: int, path=()):
    """Return params with conv/dense kernels re-drawn Kaiming-normal."""
    out = {}
    for k, v in params.items():
        sub_path = path + (k,)
        if isinstance(v, dict):
            # skip SE blocks (sigmoid-terminated) and learned upsampling
            if k.startswith("se_") or k == "upsample" or k.startswith("upsample"):
                out[k] = v
                continue
            rng, sub = jax.random.split(rng)
            out[k] = apply_he_init(v, sub, n_classes, sub_path)
        elif k == "kernel" and hasattr(v, "ndim") and v.ndim >= 2:
            fan_out = int(np.prod(v.shape[:-2])) * v.shape[-1]
            if v.ndim == 4:
                fan_out = v.shape[0] * v.shape[1] * v.shape[-1]
            if v.shape[-1] == n_classes or (v.ndim == 4 and v.shape[2] == 1 and v.shape[3] > 8):
                out[k] = v  # output layer or depthwise conv
                continue
            rng, sub = jax.random.split(rng)
            std = np.sqrt(2.0 / fan_out)
            out[k] = std * jax.random.normal(sub, v.shape, v.dtype)
        else:
            out[k] = v
    return out


def _strip_prefix(sd: dict, prefix: str) -> dict:
    return {
        k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
    }


def import_imagenet_resnet(
    path: str, encoder_params: dict, encoder_stats: dict,
    input_channels: int = 3,
) -> tuple[dict, dict]:
    """Load a torchvision ResNet .pth into an encoder subtree (HWIO etc.).

    For depth encoders (input_channels == 1) the rgb stem kernel is summed
    over its input channels, the reference's weight surgery."""
    from dynmm_tpu.utils.torch_import import (
        load_torch_state_dict,
        merge_into,
        state_dict_to_trees,
    )

    sd = load_torch_state_dict(path)
    if any(k.startswith("encoder.") for k in sd):
        sd = _strip_prefix(sd, "encoder.")
    sd = {k: v for k, v in sd.items() if not k.startswith("fc.")}
    if input_channels == 1 and "conv1.weight" in sd:
        sd["conv1.weight"] = sd["conv1.weight"].sum(axis=1, keepdims=True)
    t_params, t_stats = state_dict_to_trees(sd)
    params = jax.tree_util.tree_map(lambda x: x, encoder_params)
    stats = jax.tree_util.tree_map(lambda x: x, encoder_stats)
    report: list = []
    merge_into(params, t_params, report=report)
    merge_into(stats, t_stats, report=report)
    if report:
        print(f"imagenet import: {len(report)} unconsumed keys")
    return params, stats


# alias: the NBt1D checkpoints use the same 'encoder.'-prefixed layout
import_nbt1d_encoder = import_imagenet_resnet
