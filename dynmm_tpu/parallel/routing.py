"""Distributed routed inference: device-local adaptive skipping.

The reference is single-device; its dynamic value (skip depth-encoder
stages for easy inputs) has no distributed analogue. The TPU-native
formulation: ``shard_map`` the batch over the mesh's 'data' axis and run
the BATCH-ADAPTIVE routed forward (``forward_switch_batched``) per shard —
each device computes its own gate decisions and its own ``k_max``, so a
device whose shard is all-easy skips its depth stages entirely while a
neighbor with hard samples runs deep, with NO cross-device sync on the
routing decision (the only collectives are whatever the params' shardings
need; params are replicated here).

This beats global-batch routing (jit over the full batch computes ONE
k_max across all devices — one hard sample anywhere forfeits everyone's
skips) exactly the way per-sample bucket compaction beats batch-max within
one device.

Usage:
    mesh = make_mesh(n_data=8)
    fn = make_sharded_routed_forward(model, mesh)
    logits = fn(variables, rgb, depth)   # batch % n_data == 0
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def make_sharded_routed_forward(model, mesh, method_name: str =
                                "forward_switch_batched", **apply_kwargs):
    """Jitted fn(variables, rgb, depth) -> logits with the batch sharded
    over the mesh's 'data' axis and routing decisions taken PER DEVICE.

    ``method_name``: any batched routing method of the model
    (``forward_switch_batched`` — device-local batch-max skipping — or
    ``forward_routed_compact`` for per-sample compaction within each
    shard). Params are replicated; batch dims shard over 'data'."""
    try:  # jax.shard_map from 0.4.35+; experimental path is deprecated
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    def per_shard(variables, rgb, depth):
        method = getattr(model, method_name)
        return model.apply(variables, rgb, depth, method=method,
                           **apply_kwargs)

    data_spec = P("data")
    kwargs = dict(mesh=mesh, in_specs=(P(), data_spec, data_spec),
                  out_specs=data_spec)
    try:  # replication checking must be off: lax.cond on LOCAL gate values
        shard_fn = shard_map(per_shard, check_rep=False, **kwargs)
    except TypeError:  # newer jax renamed the flag
        shard_fn = shard_map(per_shard, check_vma=False, **kwargs)

    @functools.partial(jax.jit)
    def run(variables, rgb, depth):
        return shard_fn(variables, rgb, depth)

    return run
