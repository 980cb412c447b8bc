"""Training objectives matching the torch criteria the reference uses
(``Supervised_Learning.py:53-63``, ``train.py:101-128``): BCE-with-logits
(multilabel IMDB), L1 (MOSEI regression), MSE, cross-entropy.

All reduce with mean over every element, matching torch's default
``reduction='mean'`` semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    return optax.sigmoid_binary_cross_entropy(logits, targets).mean()


def l1_loss(pred: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.abs(pred - targets).mean()


def mse_loss(pred: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.square(pred - targets).mean()


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Integer-label CE; squeezes a trailing singleton label dim like the
    reference's ``deal_with_objective`` (Supervised_Learning.py:54-59)."""
    if labels.ndim == logits.ndim:
        labels = labels.squeeze(-1)
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels.astype(jnp.int32)
    ).mean()


OBJECTIVES = {
    "bce_with_logits": bce_with_logits,
    "l1": l1_loss,
    "mse": mse_loss,
    "cross_entropy": cross_entropy,
}


def get_objective(name: str):
    return OBJECTIVES[name]
