"""Analytic FLOP counting via XLA cost analysis — the TPU-native replacement
for the reference's ``thop.profile`` scripts
(``ModalityDynMM/multimedia/count_flop.py``, ``affect/count_flop.py``, and
the commented profiling blocks in ``model_skip_mod_globalgate.py:413-418``).

``count_flops`` lowers a jitted callable and reads the compiler's own FLOP
estimate; ``count_macs`` halves it (1 MAC = 2 FLOPs) to match thop's MAC
convention used throughout the reference's tables.
"""

from __future__ import annotations

from typing import Any, Callable

import jax


def count_flops(fn: Callable, *args, **kwargs) -> float:
    """FLOPs of one call of ``fn(*args)`` per XLA cost analysis."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    try:
        cost = lowered.compile().cost_analysis()
    except Exception:
        cost = lowered.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def count_macs(fn: Callable, *args, **kwargs) -> float:
    """thop-convention multiply-accumulates (= FLOPs / 2)."""
    return count_flops(fn, *args, **kwargs) / 2.0


def count_params(params: Any) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
