"""PyTorch checkpoint import → flax variable trees.

The reference persists two checkpoint styles (SURVEY §5.4):
* FusionDynMM: dict checkpoints ``{epoch, state_dict, optimizer[, best_miou]}``
  (``src/utils.py:118-143``) — plain tensors, loadable anywhere.
* ModalityDynMM: whole pickled ``nn.Module`` objects (``torch.save(model, f)``,
  ``Supervised_Learning.py:208``) — normally require the defining classes;
  ``load_torch_module_pickle`` reconstructs them with stub classes and walks
  ``_modules``/``_parameters``/``_buffers`` to recover a state_dict.

Key translation is rule-based (structure, not a hand-written table), covering
the whole ESANet family: torch ``layer1.0.conv1.weight`` →
``layer1/block0/conv1/kernel`` etc. Tensor layout transforms: conv OIHW→HWIO
(depthwise included), linear (out,in)→(in,out), BN weight/bias→scale/bias and
running stats → the ``batch_stats`` collection.

Import parity is the acceptance test for mIoU ≥ 50.9 with identical hard-gate
selections (BASELINE.md).
"""

from __future__ import annotations

import pickle
import re
from typing import Any, Optional

import numpy as np


# --------------------------------------------------------------------- loading
def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a ``.pth`` dict checkpoint (or bare state_dict) as numpy arrays."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if not isinstance(obj, dict):
        # whole pickled module
        obj = obj.state_dict()
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in obj.items()
            if hasattr(v, "detach")}


class _StubModule:
    """Generic shell standing in for any unimportable torch nn.Module class."""

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)

    def __call__(self, *a, **k):  # never executed; present for safety
        raise RuntimeError("stub module is not executable")


def load_torch_module_pickle(path: str) -> dict[str, np.ndarray]:
    """Recover a state_dict from a whole-module torch pickle even when the
    defining classes (e.g. MultiBench) are not importable."""
    import torch

    class StubUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return type(name, (_StubModule,), {"__module__": module})

    import types

    pm = types.ModuleType("stub_pickle")
    pm.__dict__.update(pickle.__dict__)
    pm.Unpickler = StubUnpickler

    with open(path, "rb") as f:
        obj = torch.load(f, map_location="cpu", weights_only=False, pickle_module=pm)

    state: dict[str, np.ndarray] = {}

    def walk(mod, prefix=""):
        d = getattr(mod, "__dict__", {})
        for name, p in (d.get("_parameters") or {}).items():
            if p is not None:
                state[prefix + name] = np.asarray(p.detach().cpu().numpy())
        for name, b in (d.get("_buffers") or {}).items():
            if b is not None:
                state[prefix + name] = np.asarray(b.detach().cpu().numpy())
        for name, sub in (d.get("_modules") or {}).items():
            if sub is not None:
                walk(sub, prefix + name + ".")

    walk(obj)
    return state


# ------------------------------------------------------------- key translation
_SEG_RULES = [
    # ResNet stages: layer1.0.xxx -> layer1.block0.xxx
    (re.compile(r"^(layer\d)\.(\d+)\."), r"\1.block\2."),
    (re.compile(r"\.(layer\d)\.(\d+)\."), r".\1.block\2."),
    # downsample Sequential: 0 = conv, 1 = bn
    (re.compile(r"\.downsample\.0\."), r".ds_conv."),
    (re.compile(r"\.downsample\.1\."), r".ds_bn."),
    # SE fc Sequential: 0 = reduce conv, 2 = expand conv
    (re.compile(r"\.fc\.0\."), r".fc1."),
    (re.compile(r"\.fc\.2\."), r".fc2."),
    # GlobalGate conv Sequential: 0 conv,1 bn,3 conv,4 bn
    (re.compile(r"gate_layer\.conv\.0\."), r"gate_layer.conv1."),
    (re.compile(r"gate_layer\.conv\.1\."), r"gate_layer.bn1."),
    (re.compile(r"gate_layer\.conv\.3\."), r"gate_layer.conv2."),
    (re.compile(r"gate_layer\.conv\.4\."), r"gate_layer.bn2."),
    # PPM: features.i.(1.)conv -> feature{i}.conv  (Sequential(pool, ConvBNAct))
    (re.compile(r"\.features\.(\d+)\.1\."), r".feature\1."),
    (re.compile(r"\.features\.(\d+)\."), r".feature\1."),
    # skip layers: Sequential index 0
    (re.compile(r"\.(skip_layer\d)\.0\."), r".\1."),
    (re.compile(r"^(skip_layer\d)\.0\."), r"\1."),
    # decoder blocks: decoder_blocks.i -> decoder_blocks{i}
    (re.compile(r"\.decoder_blocks\.(\d+)\."), r".decoder_blocks\1."),
]


def translate_seg_key(tkey: str) -> str:
    for pat, rep in _SEG_RULES:
        tkey = pat.sub(rep, tkey)
    return tkey


# Modality-level (MultiBench-structured) checkpoints: the branch modules are
# MultiBench classes whose torch attribute names differ from ours. Known
# mappings (MultiBench MLP uses attributes ``fc``/``fc2``; our MLP uses
# ``fc1``/``fc2``). Transformer/MaxOut internals differ structurally and are
# reported as unconsumed — load what maps, warn about the rest.
_MODALITY_RULES = [
    (re.compile(r"(^|\.)fc\.(weight|bias)$"), r"\1fc1.\2"),
    (re.compile(r"\.encoders\.(\d+)\."), r".encoders_\1."),
]


def translate_modality_key(tkey: str) -> str:
    for pat, rep in _MODALITY_RULES:
        tkey = pat.sub(rep, tkey)
    return tkey


def _tensor_to_flax(parts: list[str], value: np.ndarray):
    """→ (collection, path, array) or None to drop."""
    leaf = parts[-1]
    if leaf == "num_batches_tracked":
        return None
    if leaf in ("running_mean", "running_var"):
        name = "mean" if leaf == "running_mean" else "var"
        return "batch_stats", parts[:-1] + [name], value
    if leaf == "weight":
        if value.ndim == 4:  # conv OIHW -> HWIO
            return "params", parts[:-1] + ["kernel"], value.transpose(2, 3, 1, 0)
        if value.ndim == 2:  # linear (out,in) -> (in,out)
            return "params", parts[:-1] + ["kernel"], value.transpose(1, 0)
        if value.ndim == 1:  # batchnorm scale
            return "params", parts[:-1] + ["scale"], value
    if leaf == "bias":
        return "params", parts[:-1] + ["bias"], value
    return "params", parts, value


def state_dict_to_trees(
    state_dict: dict[str, np.ndarray],
    translate=translate_seg_key,
) -> tuple[dict, dict]:
    """→ (params, batch_stats) nested dicts with flax naming."""
    params: dict = {}
    batch_stats: dict = {}

    def insert(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for tkey, value in state_dict.items():
        fkey = translate(tkey)
        out = _tensor_to_flax(fkey.split("."), value)
        if out is None:
            continue
        collection, path, arr = out
        insert(params if collection == "params" else batch_stats, path, arr)
    return params, batch_stats


# ----------------------------------------------------------------- tree merge
def merge_into(target: dict, source: dict, path="", strict: bool = False,
               report: Optional[list] = None):
    """Recursively copy source leaves into the target structure (shape-checked).
    Unknown keys are collected into ``report`` (or raise when strict)."""
    import jax.numpy as jnp

    for k, v in source.items():
        if k not in target:
            msg = f"unconsumed: {path}{k}"
            if strict:
                raise KeyError(msg)
            if report is not None:
                report.append(msg)
            continue
        if isinstance(v, dict):
            merge_into(target[k], v, path + k + ".", strict, report)
        else:
            tgt = target[k]
            if tuple(tgt.shape) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch at {path}{k}: ckpt {v.shape} vs model {tgt.shape}"
                )
            target[k] = jnp.asarray(v, dtype=tgt.dtype)
    return target


def import_torch_checkpoint(
    path: str,
    params: dict,
    model_state: dict,
    translate=translate_seg_key,
    strict: bool = False,
    verbose: bool = True,
) -> tuple[dict, dict]:
    """Load a torch ``.pth``/``.pt`` checkpoint into (params, model_state)."""
    import jax

    try:
        sd = load_torch_state_dict(path)
    except Exception:
        sd = load_torch_module_pickle(path)
    t_params, t_stats = state_dict_to_trees(sd, translate)

    params = jax.tree_util.tree_map(lambda x: x, params)  # copy
    model_state = jax.tree_util.tree_map(lambda x: x, model_state)
    report: list[str] = []
    merge_into(params, t_params, strict=strict, report=report)
    if "batch_stats" in model_state and t_stats:
        merge_into(model_state["batch_stats"], t_stats, strict=strict, report=report)
    if verbose and report:
        print(f"torch import: {len(report)} unconsumed keys (first 10):")
        for r in report[:10]:
            print("  ", r)
    return params, model_state


def import_scenenet_pretrain(
    path: str, params: dict, model_state: dict, context_module: str = "ppm"
) -> tuple[dict, dict]:
    """SceneNet-pretrain warm start (build_model.py:180-206): load the torch
    checkpoint but drop (side-)output heads and the two learned upsamplings
    (class counts differ), plus the context-module features when the target
    context module is not ppm/appm."""
    sd = load_torch_state_dict(path)
    keys_to_ignore = [
        k for k in sd
        if "out" in k or "decoder.upsample1" in k or "decoder.upsample2" in k
    ]
    if context_module not in ("ppm", "appm"):
        keys_to_ignore.extend(k for k in sd if "context_module.features" in k)
    for k in keys_to_ignore:
        sd.pop(k)
    import jax

    t_params, t_stats = state_dict_to_trees(sd)
    params = jax.tree_util.tree_map(lambda x: x, params)
    model_state = jax.tree_util.tree_map(lambda x: x, model_state)
    report: list = []
    merge_into(params, t_params, report=report)
    if "batch_stats" in model_state and t_stats:
        merge_into(model_state["batch_stats"], t_stats, report=report)
    if report:
        print(f"scenenet import: {len(report)} unconsumed keys")
    return params, model_state


def load_any_checkpoint(path: str, model, params: dict, model_state: dict):
    """Dispatch native msgpack vs torch checkpoints (used by the CLIs)."""
    import os
    import sys

    if not os.path.isfile(path):
        print(f"=> no checkpoint found at '{path}'")
        sys.exit(1)
    if path.endswith((".pth", ".pt")):
        return import_torch_checkpoint(path, params, model_state)
    from dynmm_tpu.utils.checkpoint import load_checkpoint

    payload = load_checkpoint(
        path, {"params": params, "model_state": model_state, "opt_state": None}
        if False else None,
    )
    state = payload["state"]
    import flax.serialization
    import jax

    new_params = flax.serialization.from_state_dict(params, state["params"])
    # collections the target model declares but the checkpoint predates
    # (e.g. the 'quant' calibration scales of an int8 serving twin) keep
    # their template values; everything the checkpoint has is restored
    ckpt_ms = state["model_state"]
    extra = {k: v for k, v in model_state.items() if k not in ckpt_ms}
    new_model_state = flax.serialization.from_state_dict(
        {k: v for k, v in model_state.items() if k in ckpt_ms}, ckpt_ms
    )
    return new_params, {**new_model_state, **extra}
