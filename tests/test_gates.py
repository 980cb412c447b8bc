"""Unit tests for the gate primitives — values and straight-through gradients.

Gradient expectations are hand-derived from the softmax Jacobian; torch (CPU)
is used as an independent numerical cross-check of the straight-through
estimator, mirroring the reference's DiffSoftmax semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dynmm_tpu.core import diff_softmax, gumbel_softmax
from dynmm_tpu.core.gates import hard_one_hot


def torch_diff_softmax(logits, tau=1.0, hard=False, dim=-1):
    """Independent torch implementation of the DiffSoftmax contract used as a
    numerical oracle (semantics per model_skip_mod_globalgate.py:20-30)."""
    y_soft = (logits / tau).softmax(dim)
    if not hard:
        return y_soft
    index = y_soft.max(dim, keepdim=True)[1]
    y_hard = torch.zeros_like(logits).scatter_(dim, index, 1.0)
    return y_hard - y_soft.detach() + y_soft


class TestDiffSoftmaxValues:
    def test_soft_matches_softmax(self):
        logits = jnp.array([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]])
        out = diff_softmax(logits, tau=0.5, hard=False)
        expected = jax.nn.softmax(logits / 0.5, axis=-1)
        np.testing.assert_allclose(out, expected, rtol=1e-6)

    def test_hard_is_one_hot(self):
        logits = jnp.array([[1.0, 5.0, 3.0], [2.0, -1.0, 0.0]])
        out = diff_softmax(logits, tau=1.0, hard=True)
        np.testing.assert_array_equal(np.asarray(out).argmax(-1), [1, 0])
        np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, rtol=1e-6)
        assert set(np.round(np.asarray(out).ravel(), 6)) <= {0.0, 1.0}

    def test_hard_tie_breaks_to_first_index(self):
        # torch .max returns the first maximal index; argmax in jnp does too.
        logits = jnp.array([[2.0, 2.0, 1.0]])
        out = hard_one_hot(jax.nn.softmax(logits))
        np.testing.assert_array_equal(np.asarray(out), [[1.0, 0.0, 0.0]])

    def test_matches_torch_oracle(self, rng):
        x = rng.standard_normal((4, 5)).astype(np.float32)
        for tau in (1.0, 0.3):
            for hard in (False, True):
                ours = diff_softmax(jnp.asarray(x), tau=tau, hard=hard)
                theirs = torch_diff_softmax(torch.tensor(x), tau=tau, hard=hard)
                np.testing.assert_allclose(
                    np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-6
                )


class TestStraightThroughGradient:
    def test_hard_gradient_equals_soft_gradient(self, rng):
        """The ST estimator must carry exactly the soft-softmax gradient."""
        x = rng.standard_normal((3, 4)).astype(np.float32)
        g = rng.standard_normal((3, 4)).astype(np.float32)  # cotangent

        def soft_fn(logits):
            return (diff_softmax(logits, tau=0.7, hard=False) * g).sum()

        def hard_fn(logits):
            return (diff_softmax(logits, tau=0.7, hard=True) * g).sum()

        np.testing.assert_allclose(
            jax.grad(soft_fn)(jnp.asarray(x)),
            jax.grad(hard_fn)(jnp.asarray(x)),
            rtol=1e-5,
            atol=1e-6,
        )

    def test_gradient_matches_hand_derivation(self):
        """d/dl_j softmax_i(l/tau) = (1/tau) * s_i (δ_ij - s_j); check the
        gradient of the first component of a 2-way gate."""
        tau = 2.0
        logits = jnp.array([1.0, -1.0])

        def first_weight(l):
            return diff_softmax(l, tau=tau, hard=True)[0]

        s = jax.nn.softmax(logits / tau)
        expected = jnp.array(
            [s[0] * (1 - s[0]) / tau, -s[0] * s[1] / tau]
        )
        np.testing.assert_allclose(
            jax.grad(first_weight)(logits), expected, rtol=1e-5
        )

    def test_gradient_matches_torch(self, rng):
        x = rng.standard_normal((2, 5)).astype(np.float32)
        g = rng.standard_normal((2, 5)).astype(np.float32)

        jx = jnp.asarray(x)
        jgrad = jax.grad(lambda l: (diff_softmax(l, tau=0.5, hard=True) * g).sum())(jx)

        tx = torch.tensor(x, requires_grad=True)
        (torch_diff_softmax(tx, tau=0.5, hard=True) * torch.tensor(g)).sum().backward()
        np.testing.assert_allclose(np.asarray(jgrad), tx.grad.numpy(), rtol=1e-4, atol=1e-6)


class TestGumbelSoftmax:
    def test_soft_rows_sum_to_one(self):
        key = jax.random.PRNGKey(0)
        logits = jnp.zeros((16, 4))
        out = gumbel_softmax(key, logits, tau=1.0, hard=False)
        np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, rtol=1e-5)

    def test_hard_is_one_hot_and_st_gradient_flows(self):
        key = jax.random.PRNGKey(1)
        logits = jnp.array([[0.5, -0.5, 0.1]] * 8)
        out = gumbel_softmax(key, logits, tau=1.0, hard=True)
        np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, rtol=1e-5)
        assert set(np.round(np.asarray(out).ravel(), 5)) <= {0.0, 1.0}

        grad = jax.grad(
            lambda l: gumbel_softmax(key, l, tau=1.0, hard=True).sum(axis=0)[0]
        )(logits)
        assert np.abs(np.asarray(grad)).sum() > 0  # gradient flows through ST

    def test_distribution_tracks_logits(self):
        """With strongly-separated logits the argmax should favor the large one."""
        key = jax.random.PRNGKey(2)
        logits = jnp.tile(jnp.array([[4.0, 0.0]]), (512, 1))
        out = gumbel_softmax(key, logits, tau=1.0, hard=True)
        frac = float(np.asarray(out)[:, 0].mean())
        assert frac > 0.85  # P(argmax=0) = e^4/(e^4+1) ≈ 0.982

    def test_jit_compatible(self):
        f = jax.jit(lambda k, l: gumbel_softmax(k, l, tau=0.5, hard=True))
        out = f(jax.random.PRNGKey(0), jnp.zeros((4, 3)))
        assert out.shape == (4, 3)
