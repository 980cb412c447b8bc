"""Export flax variable trees to PyTorch-style state_dicts.

The inverse of ``dynmm_tpu.utils.torch_import``: walks the params +
batch_stats trees, converts layouts back (HWIO→OIHW, (in,out)→(out,in),
scale→weight, mean/var→running stats) and renames structural segments to the
reference's torch naming (block{i} → layer.i, ds_conv → downsample.0, ...).

Uses: (a) hand models trained here back to users of the reference torch code;
(b) the import/export round-trip doubles as a completeness proof that every
parameter in the model is covered by the key-translation rules.
"""

from __future__ import annotations

import re

import jax
import numpy as np

# inverse structural renames (order matters: most specific first)
_INV_RULES = [
    (re.compile(r"\.block(\d+)\."), lambda m: f".{m.group(1)}."),
    (re.compile(r"\.ds_conv\."), lambda m: ".downsample.0."),
    (re.compile(r"\.ds_bn\."), lambda m: ".downsample.1."),
    (re.compile(r"gate_layer\.conv1\."), lambda m: "gate_layer.conv.0."),
    (re.compile(r"gate_layer\.bn1\."), lambda m: "gate_layer.conv.1."),
    (re.compile(r"gate_layer\.conv2\."), lambda m: "gate_layer.conv.3."),
    (re.compile(r"gate_layer\.bn2\."), lambda m: "gate_layer.conv.4."),
    (re.compile(r"\.fc1\."), lambda m: ".fc.0."),
    (re.compile(r"\.fc2\."), lambda m: ".fc.2."),
    (re.compile(r"\.feature(\d+)\."), lambda m: f".features.{m.group(1)}.1."),
    (re.compile(r"(^|\.)(skip_layer\d)\."), lambda m: f"{m.group(1)}{m.group(2)}.0."),
    (re.compile(r"\.decoder_blocks(\d+)\."), lambda m: f".decoder_blocks.{m.group(1)}."),
]


def flax_to_torch_key(fkey: str) -> str:
    for pat, rep in _INV_RULES:
        fkey = pat.sub(rep, fkey)
    return fkey


def _leaf_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _leaf_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def export_state_dict(params: dict, batch_stats: dict | None = None) -> dict:
    """→ {torch_key: numpy array} with torch layouts."""
    out: dict[str, np.ndarray] = {}
    for path, value in _leaf_paths(params):
        value = np.asarray(value)
        leaf = path[-1]
        base = ".".join(path[:-1])
        if leaf == "kernel":
            if value.ndim == 4:
                out[flax_to_torch_key(base + ".weight")] = value.transpose(3, 2, 0, 1)
            elif value.ndim == 2:
                out[flax_to_torch_key(base + ".weight")] = value.transpose(1, 0)
            else:
                out[flax_to_torch_key(base + ".weight")] = value
        elif leaf == "scale":
            out[flax_to_torch_key(base + ".weight")] = value
        elif leaf == "bias":
            out[flax_to_torch_key(base + ".bias")] = value
        else:
            out[flax_to_torch_key(".".join(path))] = value
    for path, value in _leaf_paths(batch_stats or {}):
        value = np.asarray(value)
        leaf = path[-1]
        base = ".".join(path[:-1])
        name = "running_mean" if leaf == "mean" else "running_var"
        out[flax_to_torch_key(f"{base}.{name}")] = value
    return out


def save_torch_checkpoint(path: str, params: dict, batch_stats=None,
                          epoch: int = 0) -> str:
    """Write a reference-compatible ``{epoch, state_dict, optimizer}`` .pth."""
    import torch

    sd = {
        k: torch.tensor(np.ascontiguousarray(v))
        for k, v in export_state_dict(params, batch_stats).items()
    }
    torch.save({"epoch": epoch, "state_dict": sd, "optimizer": {}}, path)
    return path
