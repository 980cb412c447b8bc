"""Expert-checkpoint helpers for the two-step DynMM workflow: train expert
branches first, then load them into a router and train the gate
(the reference's core usage contract, README.md:20-48).

Experts are saved as msgpack trees ``{params, batch_stats}``; routers merge
them into the matching submodule subtrees (e.g. ``text_encoder``,
``branch3``), replacing the reference's ``torch.load`` of whole pickled
modules (``imdb_dyn.py:34-45``).
"""

from __future__ import annotations

import os
from typing import Optional

import flax.serialization
import jax
import numpy as np


def save_expert(path: str, params, batch_stats=None) -> str:
    payload = {
        "params": jax.tree_util.tree_map(np.asarray, params),
        "batch_stats": jax.tree_util.tree_map(np.asarray, batch_stats or {}),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    return path


def load_expert(path: str) -> dict:
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def inject_expert(variables: dict, submodule: str, expert: dict,
                  expert_sub: Optional[str] = None) -> dict:
    """Return a copy of ``variables`` with the expert's trees grafted into
    ``params[submodule]`` / ``batch_stats[submodule]``. ``expert_sub`` picks a
    subtree of the saved expert (e.g. its 'encoder')."""
    variables = jax.tree_util.tree_map(lambda x: x, variables)

    def pick(tree):
        return tree[expert_sub] if expert_sub else tree

    src_params = pick(expert["params"])
    tgt = variables["params"][submodule]
    variables["params"][submodule] = flax.serialization.from_state_dict(
        tgt, flax.serialization.to_state_dict(src_params)
    )
    if expert.get("batch_stats") and submodule in variables.get("batch_stats", {}):
        src_bs = pick(expert["batch_stats"])
        if src_bs:
            tgt_bs = variables["batch_stats"][submodule]
            variables["batch_stats"][submodule] = flax.serialization.from_state_dict(
                tgt_bs, flax.serialization.to_state_dict(src_bs)
            )
    return variables
