"""Resource (FLOP) losses and gate-decision statistics.

Reference behaviors reproduced:

* Fusion-level resource loss: ``loss = (weight.mean(0) * depth_enc_flop).mean()``
  — i.e. the elementwise product of the batch-mean gate weights with a
  per-path cost table, then the *mean over paths* (not the sum)
  (``FusionDynMM/src/models/model_skip_mod_globalgate.py:314-322``).
* Budget hinge: ``total = loss_seg + ratio * max(0, loss_flop - budget)``
  (``FusionDynMM/train.py:316-319``).
* Modality-level resource signal: the mean weight of the expensive branch,
  ``weight[:, 1].mean()`` (``ModalityDynMM/multimedia/imdb_dyn.py:100-101``).
* Gate statistics: accumulate per-sample weights across an eval pass, report
  mean branch weights and the cost-table dot product
  (``imdb_dyn.py:72-87``, ``model_skip_mod_globalgate.py:230-253``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def expected_cost_loss(weights: jax.Array, cost_table: jax.Array) -> jax.Array:
    """Expected-cost resource loss: mean over paths of batch-mean weight × cost.

    ``weights``: (batch, n_paths) gate outputs. ``cost_table``: (n_paths,) costs
    (e.g. depth-encoder GFLOPs per hard path). Returns a scalar equal to
    ``(weights.mean(0) * cost_table).mean()`` — replicating the reference's
    path-mean (not sum) normalization exactly.
    """
    return (weights.mean(axis=0) * cost_table).mean()


def budget_hinge(cost: jax.Array, budget: float | jax.Array) -> jax.Array:
    """Hinge penalty ``max(0, cost - budget)``."""
    return jnp.maximum(0.0, cost - budget)


class GateStats:
    """Host-side accumulator for per-sample gate decisions across an eval pass.

    Functional JAX models return gate weights; this collects them on host and
    reproduces the reference's bookkeeping API:
    ``reset()`` ~ ``reset_weight``/``start_weight``, ``append(w)`` per batch,
    ``branch_ratios()`` ~ ``weight_stat``, ``expected_flops(table)`` ~
    ``cal_flop``/``end_weight(print_flop=True)``.
    """

    def __init__(self):
        self._chunks: list[np.ndarray] = []

    def reset(self) -> None:
        self._chunks = []

    def append(self, weights) -> None:
        self._chunks.append(np.asarray(jax.device_get(weights)))

    @property
    def weights(self) -> np.ndarray:
        if not self._chunks:
            return np.zeros((0, 0))
        return np.concatenate(self._chunks, axis=0)

    def branch_ratios(self) -> np.ndarray:
        """Mean weight per branch over all collected samples."""
        w = self.weights
        if w.size == 0:
            return np.zeros(0)
        return w.mean(axis=0)

    def selection_counts(self) -> np.ndarray:
        """Count of hard (==1) selections per branch
        (``model_skip_mod_globalgate.py:239-247``)."""
        w = self.weights
        if w.size == 0:
            return np.zeros(0)
        return (w == 1).sum(axis=0).astype(np.float64)

    def expected_flops(self, cost_table) -> float:
        """Σᵢ costᵢ · E[wᵢ] — the reference's ``cal_flop``
        (``imdb_dyn.py:83-87``)."""
        table = np.asarray(cost_table, dtype=np.float64)
        return float((table * self.branch_ratios()).sum())

    def selection_flops(self, cost_table) -> float:
        """Cost table weighted by hard-selection frequencies
        (``model_skip_mod_globalgate.py:248-252``)."""
        cnt = self.selection_counts()
        total = cnt.sum()
        if total == 0:
            return 0.0
        table = np.asarray(cost_table, dtype=np.float64)
        return float((table * (cnt / total)).sum())
