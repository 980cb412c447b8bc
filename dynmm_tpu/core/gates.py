"""Differentiable gate ops with straight-through gradients.

These are the primitives every DynMM model routes through. Reference behavior
(zihuixue/DynMM):

* ``DiffSoftmax`` — temperature softmax with optional straight-through hard
  one-hot (``FusionDynMM/src/models/model_skip_mod_globalgate.py:20-30``; the
  identical function is also defined at ``ModalityDynMM/multimedia/imdb_dyn.py:16-26``
  and ``ModalityDynMM/affect/affect_dyn.py:18-28``).
* ``gumbel_softmax`` — the sampled variant used by the local per-stage gates
  (``FusionDynMM/src/models/rgb_depth_fusion.py:50-56`` calls
  ``F.gumbel_softmax(w / temp, hard=...)``).

The straight-through estimator is expressed with ``jax.lax.stop_gradient``:
``y_hard - stop_gradient(y_soft) + y_soft`` has the *value* of the hard one-hot
but the *gradient* of the soft distribution — JAX's functional twin of the
``y_hard - y_soft.detach() + y_soft`` trick.

Everything here is shape-polymorphic, jit-friendly (no data-dependent Python
control flow) and dtype-preserving.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def straight_through(y_hard: jax.Array, y_soft: jax.Array) -> jax.Array:
    """Value of ``y_hard``, gradient of ``y_soft`` (straight-through estimator)."""
    return y_hard - jax.lax.stop_gradient(y_soft) + y_soft


def hard_one_hot(y_soft: jax.Array, axis: int = -1) -> jax.Array:
    """One-hot of the argmax along ``axis``, same shape/dtype as ``y_soft``.

    Ties broadcast to the *first* maximal index, matching
    ``torch.Tensor.max(dim)`` which returns the first occurrence — important
    for "identical hard-gate selections" checkpoint parity.
    """
    index = jnp.argmax(y_soft, axis=axis)
    return jax.nn.one_hot(index, y_soft.shape[axis], axis=axis, dtype=y_soft.dtype)


def diff_softmax(
    logits: jax.Array,
    tau: float | jax.Array = 1.0,
    hard: bool = False,
    axis: int = -1,
) -> jax.Array:
    """Temperature softmax with optional straight-through hard one-hot.

    ``hard`` must be a Python bool (static under jit): the hard/soft choice
    selects a different computation graph, mirroring the reference's eval-time
    ``model.hard_gate = True`` switch. Use two jitted callables (soft train
    step / hard eval step) rather than a traced conditional.
    """
    y_soft = jax.nn.softmax(logits / tau, axis=axis)
    if not hard:
        return y_soft
    return straight_through(hard_one_hot(y_soft, axis=axis), y_soft)


def sample_gumbel(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Standard Gumbel(0, 1) noise, computed as -log(-log(U))."""
    # Match torch's exponential_().log().neg() sampling up to distribution:
    # U ~ Uniform(0,1), g = -log(-log(U)).
    u = jax.random.uniform(key, shape, dtype=dtype, minval=1e-20, maxval=1.0)
    return -jnp.log(-jnp.log(u))


def gumbel_softmax(
    key: jax.Array,
    logits: jax.Array,
    tau: float | jax.Array = 1.0,
    hard: bool = False,
    axis: int = -1,
) -> jax.Array:
    """Gumbel-softmax sample with optional straight-through hard one-hot.

    Functional counterpart of ``torch.nn.functional.gumbel_softmax`` — takes an
    explicit PRNG key instead of mutating global RNG state.
    """
    g = sample_gumbel(key, logits.shape, dtype=jnp.result_type(logits, jnp.float32))
    y_soft = jax.nn.softmax((logits + g.astype(logits.dtype)) / tau, axis=axis)
    if not hard:
        return y_soft
    return straight_through(hard_one_hot(y_soft, axis=axis), y_soft)
