"""Checkpoint save/load/resume.

Native format: one msgpack file per checkpoint holding
``{epoch, params, model_state, opt_state, best_miou, best_miou_epoch}``
(flax serialization) — the functional twin of the reference's dict
checkpoints ``{epoch, state_dict, optimizer[, best_miou]}``
(``FusionDynMM/src/utils.py:118-175``). API mirrors the reference:
``save_ckpt`` / ``save_ckpt_every_epoch`` / ``load_ckpt`` /
``get_best_checkpoint`` (CSV-log max lookup, utils.py:178-191).

PyTorch checkpoint *import* lives in ``dynmm_tpu.utils.torch_import``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.serialization
import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    # to_state_dict first: optimizer states (e.g. optax NamedTuples /
    # InjectStatefulHyperparamsState) are not msgpack-serializable directly
    tree = flax.serialization.to_state_dict(tree)
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(path: str, state: dict, epoch: int, **extra) -> str:
    payload = {
        "epoch": epoch,
        "state": _to_host(state),
        **{k: _to_host(v) for k, v in extra.items()},
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    return path


def load_checkpoint(path: str, target: Optional[dict] = None) -> dict:
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    if target is not None:
        payload["state"] = flax.serialization.from_state_dict(
            target, payload["state"]
        )
    return payload


def save_ckpt(ckpt_dir: str, state: dict, epoch: int) -> str:
    """Periodic epoch checkpoint: ``ckpt_epoch_{epoch}.msgpack``."""
    return save_checkpoint(
        os.path.join(ckpt_dir, f"ckpt_epoch_{epoch}.msgpack"), state, epoch
    )


def save_ckpt_every_epoch(
    ckpt_dir: str, state: dict, epoch: int, best_miou: float, best_miou_epoch: int
) -> str:
    """Rolling resume checkpoint: ``ckpt_latest.msgpack``."""
    return save_checkpoint(
        os.path.join(ckpt_dir, "ckpt_latest.msgpack"),
        state,
        epoch,
        best_miou=float(best_miou),
        best_miou_epoch=int(best_miou_epoch),
    )


def load_ckpt(path: str, target: Optional[dict] = None):
    """Resume: returns (state, epoch, best_miou, best_miou_epoch)."""
    payload = load_checkpoint(path, target)
    return (
        payload["state"],
        int(payload["epoch"]),
        float(payload.get("best_miou", 0.0)),
        int(payload.get("best_miou_epoch", 0)),
    )


def save_orbax(path: str, state: dict, epoch: int = 0) -> str:
    """Orbax checkpointing (async-capable, shards multi-device arrays) — the
    scale-out alternative to the msgpack format for mesh-sharded training
    states. Mesh-sharded ``jax.Array`` leaves are saved shard-by-shard from
    their devices (no host gather)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {"epoch": epoch, "state": state}, force=True)
    return path


def _abstract_leaf(leaf):
    import jax

    if isinstance(leaf, jax.Array):
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                    sharding=leaf.sharding)
    return leaf


def load_orbax(path: str, target: Optional[dict] = None) -> dict:
    """Restore; with a ``target`` of live (possibly mesh-sharded) arrays the
    leaves are restored DIRECTLY onto the target's shardings (each device
    reads only its shard slices) — the sharded-resume path for mesh
    training."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None and any(
            isinstance(l, jax.Array) for l in jax.tree_util.tree_leaves(target)
        ):
            abstract = jax.tree_util.tree_map(
                _abstract_leaf, {"epoch": 0, "state": target}
            )
            return ckptr.restore(path, abstract)
        payload = ckptr.restore(path)
    if target is not None:
        payload["state"] = flax.serialization.from_state_dict(
            target, payload["state"]
        )
    return payload


def get_best_checkpoint(ckpt_dir: str, key: str = "mIoU_test") -> str:
    """Pick the epoch checkpoint with the best CSV-logged metric."""
    import pandas as pd

    log_file = os.path.join(ckpt_dir, "logs.csv")
    data = pd.read_csv(log_file)
    idx = data[key].idxmax()
    epoch = int(data.epoch[idx])
    path = os.path.join(ckpt_dir, f"ckpt_epoch_{epoch}.msgpack")
    assert os.path.exists(path), f"There is no weights file named {path}"
    print(f"Best {key}: {100 * data[key][idx]:0.2f} at epoch: {epoch}")
    return path
