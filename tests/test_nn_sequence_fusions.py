"""Behavioral tests for sequence encoders (masking semantics) and fusions."""

import jax
import jax.numpy as jnp
import numpy as np

from dynmm_tpu.nn.mlp import MLP, MaxOut_MLP, LinearHead
from dynmm_tpu.nn.sequence import GRU, Transformer, last_valid, length_mask
from dynmm_tpu.nn.fusions import (
    Concat,
    ConcatEarly,
    LowRankTensorFusion,
    MultiplicativeInteractions2Modal,
)


class TestMLP:
    def test_shapes(self):
        m = MLP(hidden_dim=512, out_dim=23)
        v = m.init(jax.random.PRNGKey(0), jnp.ones((4, 300)))
        assert m.apply(v, jnp.ones((4, 300))).shape == (4, 23)

    def test_maxout_mlp_imdb_config(self):
        # imdb_dyn.py:47 — MaxOut_MLP(512, 1024, 4096, 512, False)
        m = MaxOut_MLP(
            num_outputs=512, first_hidden=1024, second_hidden=512, linear_layer=False
        )
        v = m.init(jax.random.PRNGKey(0), jnp.ones((2, 4096)))
        assert m.apply(v, jnp.ones((2, 4096))).shape == (2, 512)

    def test_linear_head(self):
        m = LinearHead(out_dim=23)
        v = m.init(jax.random.PRNGKey(0), jnp.ones((2, 1024)))
        assert m.apply(v, jnp.ones((2, 1024))).shape == (2, 23)


class TestMasking:
    def test_length_mask(self):
        m = length_mask(jnp.array([2, 4]), 4)
        np.testing.assert_array_equal(
            np.asarray(m), [[True, True, False, False], [True] * 4]
        )

    def test_last_valid(self):
        x = jnp.arange(2 * 3 * 2, dtype=jnp.float32).reshape(2, 3, 2)
        out = last_valid(x, jnp.array([1, 3]))
        np.testing.assert_array_equal(np.asarray(out), [[0, 1], [10, 11]])


class TestGRU:
    def test_padding_invariance(self, rng):
        """Hidden state must freeze after each sequence's end: altering pad
        content must not change the output."""
        x = rng.standard_normal((2, 6, 5)).astype(np.float32)
        lengths = jnp.array([3, 6])
        m = GRU(hidden_dim=8)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), lengths)
        out1 = m.apply(v, jnp.asarray(x), lengths)

        x2 = x.copy()
        x2[0, 3:] = 99.0  # garbage in the padding of sample 0
        out2 = m.apply(v, jnp.asarray(x2), lengths)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)

    def test_matches_unpadded_run(self, rng):
        """GRU(x[:L]) == masked GRU(x, lengths=L)."""
        x = rng.standard_normal((1, 5, 4)).astype(np.float32)
        m = GRU(hidden_dim=6)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        full = m.apply(v, jnp.asarray(x[:, :3]), jnp.array([3]))
        masked = m.apply(v, jnp.asarray(x), jnp.array([3]))
        np.testing.assert_allclose(np.asarray(full), np.asarray(masked), rtol=1e-5)


class TestTransformer:
    def test_mosei_gate_config(self):
        # affect_dyn.py:120 — Transformer(409, 10) over 50-step sequences
        m = Transformer(dim=10)
        x = jnp.ones((3, 50, 409))
        lengths = jnp.array([50, 20, 1])
        v = m.init(jax.random.PRNGKey(0), x, lengths)
        out = m.apply(v, x, lengths)
        assert out.shape == (3, 10)

    def test_padding_invariance(self, rng):
        x = rng.standard_normal((2, 8, 12)).astype(np.float32)
        lengths = jnp.array([4, 8])
        m = Transformer(dim=16)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), lengths)
        out1 = m.apply(v, jnp.asarray(x), lengths)
        x2 = x.copy()
        x2[0, 4:] = -50.0
        out2 = m.apply(v, jnp.asarray(x2), lengths)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-4, atol=1e-5)

    def test_jit(self):
        m = Transformer(dim=8)
        x = jnp.ones((2, 10, 5))
        v = m.init(jax.random.PRNGKey(0), x)
        out = jax.jit(lambda v, x: m.apply(v, x))(v, x)
        assert out.shape == (2, 8)


class TestFusions:
    def test_concat(self):
        f = Concat()
        out = f.apply({}, [jnp.ones((2, 3)), jnp.ones((2, 5))])
        assert out.shape == (2, 8)

    def test_concat_early(self):
        f = ConcatEarly()
        out = f.apply({}, [jnp.ones((2, 7, 3)), jnp.ones((2, 7, 5))])
        assert out.shape == (2, 7, 8)

    def test_lrtf(self):
        f = LowRankTensorFusion(output_dim=32, rank=4)
        mods = [jnp.ones((2, 10)), jnp.ones((2, 20))]
        v = f.init(jax.random.PRNGKey(0), mods)
        assert f.apply(v, mods).shape == (2, 32)

    def test_lrtf_gradient_flows(self):
        f = LowRankTensorFusion(output_dim=8, rank=2)
        mods = [jnp.ones((2, 4)), jnp.ones((2, 6))]
        v = f.init(jax.random.PRNGKey(0), mods)
        g = jax.grad(lambda p: f.apply(p, mods).sum())(v)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)

    def test_mi2m(self):
        f = MultiplicativeInteractions2Modal(output_dim=16)
        mods = [jnp.ones((2, 8)), jnp.ones((2, 12))]
        v = f.init(jax.random.PRNGKey(0), mods)
        assert f.apply(v, mods).shape == (2, 16)
