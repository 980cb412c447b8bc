"""Tests for the MULT cross-modal fusion model and CLI smoke coverage."""

import subprocess
import sys
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynmm_tpu.models.mult import MULTModel

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestMULT:
    def test_forward_shape(self):
        model = MULTModel(embed_dim=16, num_heads=4, layers=2, output_dim=1)
        mods = [jnp.ones((2, 12, d)) for d in (35, 74, 300)]
        lengths = [jnp.array([12, 5])] * 3
        variables = model.init(jax.random.PRNGKey(0), mods, lengths)
        out = model.apply(variables, mods, lengths)
        assert out.shape == (2, 1)

    def test_padding_invariance(self, rng):
        model = MULTModel(embed_dim=8, num_heads=2, layers=1, output_dim=1)
        mods = [
            jnp.asarray(rng.standard_normal((1, 10, d)).astype(np.float32))
            for d in (35, 74, 300)
        ]
        lengths = [jnp.array([6])] * 3
        variables = model.init(jax.random.PRNGKey(0), mods, lengths)
        out1 = model.apply(variables, mods, lengths)
        mods2 = [m.at[:, 6:].set(77.0) for m in mods]
        out2 = model.apply(variables, mods2, lengths)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-4, atol=1e-5)

    def test_gradients_finite(self):
        model = MULTModel(embed_dim=8, num_heads=2, layers=1, output_dim=1)
        mods = [jnp.ones((2, 6, d)) for d in (35, 74, 300)]
        lengths = [jnp.array([6, 4])] * 3
        variables = model.init(jax.random.PRNGKey(0), mods, lengths)
        g = jax.grad(lambda p: model.apply({"params": p}, mods, lengths).sum())(
            variables["params"]
        )
        assert all(
            np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g)
        )


@pytest.mark.parametrize(
    "script,args",
    [
        ("examples/multimedia/imdb_dyn.py",
         ["--synthetic", "--n-epochs", "1", "--freeze", "--reg", "0.1"]),
        ("examples/multimedia/imdb_uni.py",
         ["--synthetic", "--n-epochs", "1", "--mod", "0"]),
    ],
)
@pytest.mark.slow
def test_cli_smoke(tmp_path, script, args):
    """The modality CLIs must run end-to-end on synthetic data (1 epoch)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = ""
    env["PYTHONPATH"] = REPO
    # force CPU inside the subprocess via sitecustomize-style env
    env["DYNMM_FORCE_CPU"] = "1"
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=900,
    )
    assert result.returncode == 0, result.stderr[-3000:]
