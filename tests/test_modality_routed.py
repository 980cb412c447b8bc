"""Per-sample bucket-compacted routing on the modality models: results must
equal dense hard eval (each sample's output = its selected branch alone),
for any capacity ladder. Mirrors tests/test_routed_compact.py (seg)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynmm_tpu.data.affect import synthetic_mosei_loaders
from dynmm_tpu.models.modality import IMDBDynMMNet, MoseiDynMMNetV2

pytestmark = pytest.mark.slow  # full CLI/parity/mesh drive; -m "not slow" skips


@pytest.fixture(scope="module")
def mosei():
    train_loader, _, _ = synthetic_mosei_loaders(
        n_train=32, n_valid=16, batch_size=16
    )
    batch = next(iter(train_loader))
    inputs = [jnp.asarray(x) for x in batch.inputs]
    lengths = [jnp.asarray(l) for l in batch.lengths]
    model = MoseiDynMMNetV2()
    variables = model.init(jax.random.PRNGKey(0), inputs, lengths)
    return model, variables, inputs, lengths


@pytest.fixture(scope="module")
def imdb():
    rng = np.random.default_rng(7)
    inputs = [
        jnp.asarray(rng.standard_normal((16, 300)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((16, 4096)).astype(np.float32)),
    ]
    model = IMDBDynMMNet()
    variables = model.init(jax.random.PRNGKey(1), inputs)
    return model, variables, inputs


def _mosei_dense_hard(model, variables, inputs, lengths):
    out, _, w = model.apply(variables, inputs, lengths, hard=True)
    return np.asarray(out), np.asarray(w)


class TestMoseiRoutedCompact:
    @pytest.mark.parametrize("caps", [None, (0, 16), (0, 4, 8, 12, 16)])
    def test_matches_dense_hard(self, mosei, caps):
        model, variables, inputs, lengths = mosei
        ref, ref_w = _mosei_dense_hard(model, variables, inputs, lengths)
        out, w = model.apply(
            variables, inputs, lengths, caps=caps,
            method=model.forward_routed_compact,
        )
        np.testing.assert_array_equal(np.asarray(w), ref_w)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)

    def test_extreme_gates(self, mosei):
        """All-cheap and all-expensive batches exercise the cap=0 rungs."""
        model, variables, inputs, lengths = mosei
        for col, branch in ((0, 1), (1, 2)):
            bias = np.zeros(2, np.float32)
            bias[col] = 50.0
            params = dict(variables["params"])
            gate = dict(params["gate"])
            fc_p = dict(gate["fc"])
            fc_p["kernel"] = jnp.zeros_like(jnp.asarray(fc_p["kernel"]))
            fc_p["bias"] = jnp.asarray(bias)
            gate["fc"] = fc_p
            params["gate"] = gate
            forced = {**variables, "params": params}

            out, w = model.apply(
                forced, inputs, lengths,
                method=model.forward_routed_compact,
            )
            assert np.all(np.argmax(np.asarray(w), axis=-1) == col)
            branch_out, _, _ = model.apply(
                forced, inputs, lengths, infer_mode=branch
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(branch_out), rtol=1e-5, atol=1e-6
            )


class TestIMDBRoutedCompact:
    @pytest.mark.parametrize("caps", [None, (0, 16), (0, 8, 16)])
    def test_matches_dense_hard(self, imdb, caps):
        model, variables, inputs = imdb
        ref, _, ref_w = model.apply(variables, inputs, hard=True)
        out, w = model.apply(
            variables, inputs, caps=caps,
            method=model.forward_routed_compact,
        )
        np.testing.assert_array_equal(np.asarray(w), np.asarray(ref_w))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6
        )

    def test_jit_under_mesh_conftest(self, imdb):
        """The routed forward must stay jittable (static caps, traced gate)."""
        model, variables, inputs = imdb

        @jax.jit
        def run(v, t, i):
            return model.apply(v, (t, i), method=model.forward_routed_compact)

        out, w = run(variables, inputs[0], inputs[1])
        ref, _, _ = model.apply(variables, inputs, hard=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6
        )
