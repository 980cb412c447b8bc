"""Mesh construction and sharding rules for pjit SPMD execution.

The reference is strictly single-device (SURVEY §2.4: no DP/TP/PP anywhere);
the TPU-native scale-out is single-program data parallelism over a
('data', 'model') mesh with optional output-channel sharding of the large
kernels:

* batch dims shard over 'data' (ICI all-reduce of gradients is inserted by
  GSPMD because params are replicated over 'data')
* the widest conv/dense kernels shard their output-channel dim over 'model',
  splitting the heaviest MXU work; XLA inserts the matching collectives

Everything goes through ``jax.jit`` + ``NamedSharding`` — no hand-written
collectives on the baseline path (Pallas kernels may add their own).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """('data', 'model') mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully-replicated placement."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Shard every array's leading (batch) dim over 'data'."""

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P("data")))

    return jax.tree_util.tree_map(put, tree)


def make_global_batch(tree: Any, mesh: Mesh) -> Any:
    """Build GLOBAL batch arrays from this process's HOST-LOCAL data via
    ``jax.make_array_from_process_local_data`` (SURVEY §5.8): each host
    feeds only the rows destined for its own addressable devices on the
    'data' axis — no cross-host scatter of full batches. In a
    single-process run the local data is the whole batch and this equals
    ``shard_batch``; in a multi-host run each process passes its
    ``ProcessShard``-served slice and jax assembles the logical global
    array without materializing it anywhere."""
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)


class ProcessShard:
    """Dataset view exposing only THIS process's contiguous slice — the
    host-local half of the multi-host input pipeline (pair with
    ``make_global_batch``). Non-index attributes (class counts, depth
    stats, cameras, ...) delegate to the wrapped dataset.

    ``process_index``/``process_count`` default to the live jax runtime's;
    pass them explicitly to simulate a multi-process layout in tests."""

    def __init__(self, dataset, process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self._ds = dataset
        self._count = (jax.process_count() if process_count is None
                       else process_count)
        self._index = (jax.process_index() if process_index is None
                       else process_index)
        n = len(dataset)
        per = n // self._count  # drop the ragged tail: equal per-host shards
        self._start = self._index * per
        self._len = per

    def __len__(self) -> int:
        return self._len

    def __getitem__(self, idx: int):
        if not 0 <= idx < self._len:
            raise IndexError(idx)
        return self._ds[self._start + idx]

    def __getattr__(self, name):
        return getattr(self._ds, name)


# Minimum output-channel width before a kernel is worth sharding over 'model'
MODEL_SHARDING_RULES = {"min_out_channels": 256}


def param_spec(path: tuple, leaf, n_model: int, min_out: int) -> P:
    """PartitionSpec for one param leaf: shard the trailing (output-channel)
    dim over 'model' for wide conv/dense kernels; replicate everything else
    (biases, BN stats, small kernels)."""
    name = str(path[-1]) if path else ""
    if (
        n_model > 1
        and name == "kernel"
        and leaf.ndim >= 2
        and leaf.shape[-1] >= min_out
        and leaf.shape[-1] % n_model == 0
    ):
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()


def shard_params(params: Any, mesh: Mesh, min_out: Optional[int] = None) -> Any:
    """Place params per ``param_spec`` on the mesh."""
    n_model = mesh.shape["model"]
    min_out = min_out if min_out is not None else MODEL_SHARDING_RULES["min_out_channels"]

    def put(path, leaf):
        keys = tuple(getattr(p, "key", getattr(p, "idx", None)) for p in path)
        spec = param_spec(keys, leaf, n_model, min_out)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)
