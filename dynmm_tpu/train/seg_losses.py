"""Segmentation losses: class-weighted, void-ignoring multi-scale CE.

Reference semantics (``FusionDynMM/src/utils.py:18-102``):
* labels carry void as class 0; the net predicts the 40 non-void classes, so
  targets are shifted by −1 and void (−1) pixels are ignored
* training loss normalizes by the *weighted* pixel count
  ``Σ_c count_c · w_c`` over non-void pixels (utils.py:42-47)
* one loss per scale (full, 1/8, 1/16, 1/32); total = sum (train.py:313-314)
* validation variants accumulate a sum-reduced loss and normalize by a
  precomputed weighted pixel sum (utils.py:53-75) or the plain non-void pixel
  count (utils.py:78-102)

All device-side math is fused elementwise + one reduction per scale — ideal
XLA shape. Labels arrive as (B, H, W) int arrays with 0 = void.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def weighted_ce_2d(
    logits: jax.Array, targets: jax.Array, class_weights: jax.Array
) -> jax.Array:
    """Class-weighted, void-ignoring CE normalized by the weighted pixel count.

    logits (B, H, W, C); targets (B, H, W) with 0 = void; class_weights (C,).
    """
    t = targets.astype(jnp.int32) - 1
    valid = t >= 0
    tc = jnp.clip(t, 0, logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tc[..., None], axis=-1)[..., 0]
    w = class_weights[tc] * valid.astype(logits.dtype)
    return (nll * w).sum() / jnp.maximum(w.sum(), 1e-12)


def multiscale_ce(
    preds: Sequence[jax.Array],
    targets: Sequence[jax.Array],
    class_weights: jax.Array,
) -> tuple[jax.Array, list[jax.Array]]:
    """Sum of per-scale weighted CE losses; returns (total, per-scale list)."""
    losses = [weighted_ce_2d(p, t, class_weights) for p, t in zip(preds, targets)]
    return sum(losses), losses


def ce_sum_and_weight(
    logits: jax.Array, targets: jax.Array, class_weights=None
) -> tuple[jax.Array, jax.Array]:
    """Sum-reduced CE over non-void pixels + the batch's (weighted) pixel
    count — the streaming building block for the validation losses."""
    t = targets.astype(jnp.int32) - 1
    valid = t >= 0
    tc = jnp.clip(t, 0, logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tc[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        w = class_weights[tc] * valid.astype(logits.dtype)
        return (nll * w).sum(), valid.sum()
    mask = valid.astype(logits.dtype)
    return (nll * mask).sum(), valid.sum()


class StreamingValidLoss:
    """Accumulates sum-reduced CE across eval batches; ``compute`` divides by
    either a fixed weighted pixel sum (weighted variant) or the running
    non-void pixel count (unweighted variant)."""

    def __init__(self, class_weights=None, weighted_pixel_sum: float | None = None):
        self.class_weights = class_weights
        self.weighted_pixel_sum = weighted_pixel_sum
        self.reset()

    def reset(self):
        self.total = 0.0
        self.pixels = 0

    def add_batch(self, logits, targets):
        s, n = ce_sum_and_weight(logits, targets, self.class_weights)
        self.total += float(s)
        self.pixels += int(n)

    def compute(self) -> float:
        denom = (
            self.weighted_pixel_sum
            if self.weighted_pixel_sum is not None
            else self.pixels
        )
        return self.total / max(denom, 1e-12)
