"""End-to-end test of the CMU-MOSEI modality-level DynMM slice: tri-modal
router + regression training with packed(→masked) sequences, posneg eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynmm_tpu.data.affect import synthetic_mosei_loaders
from dynmm_tpu.models.modality import MOSEI_FLOPS_M, MoseiDynMMNetV2
from dynmm_tpu.train.adapters import dynmm_adapter
from dynmm_tpu.train.supervised import SupervisedConfig, SupervisedTrainer


@pytest.fixture(scope="module")
def loaders():
    return synthetic_mosei_loaders(n_train=64, n_valid=32, batch_size=16)


@pytest.fixture(scope="module")
def model_and_vars(loaders):
    train_loader, _, _ = loaders
    model = MoseiDynMMNetV2()
    batch = next(iter(train_loader))
    variables = model.init(
        jax.random.PRNGKey(0),
        [jnp.asarray(x) for x in batch.inputs],
        [jnp.asarray(l) for l in batch.lengths],
    )
    return model, variables


class TestMoseiDynMM:
    def test_forward_contract(self, model_and_vars, loaders):
        model, variables = model_and_vars
        batch = next(iter(loaders[0]))
        out, resource, w = model.apply(
            variables,
            [jnp.asarray(x) for x in batch.inputs],
            [jnp.asarray(l) for l in batch.lengths],
            hard=True,
        )
        assert out.shape == (16, 1)
        assert w.shape == (16, 2)

    def test_uniform_ablation(self, model_and_vars, loaders):
        """infer_mode=-1 averages branches uniformly (affect_dyn.py:161-162)."""
        model, variables = model_and_vars
        batch = next(iter(loaders[0]))
        inputs = [jnp.asarray(x) for x in batch.inputs]
        lengths = [jnp.asarray(l) for l in batch.lengths]
        out_u, _, _ = model.apply(variables, inputs, lengths, infer_mode=-1)
        p0, _, _ = model.apply(variables, inputs, lengths, infer_mode=1)
        p1, _, _ = model.apply(variables, inputs, lengths, infer_mode=2)
        np.testing.assert_allclose(
            np.asarray(out_u), (np.asarray(p0) + np.asarray(p1)) / 2, rtol=1e-4, atol=1e-5
        )

    def test_switch_matches_dense_hard(self, model_and_vars, loaders):
        model, variables = model_and_vars
        batch = next(iter(loaders[0]))
        inputs = [jnp.asarray(x[:1]) for x in batch.inputs]
        lengths = [jnp.asarray(l[:1]) for l in batch.lengths]
        dense, _, w = model.apply(variables, inputs, lengths, hard=True)
        switched, w2 = model.apply(
            variables, inputs, lengths, method=model.forward_switch
        )
        np.testing.assert_allclose(
            np.asarray(dense), np.asarray(switched), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(w), np.asarray(w2))

    @pytest.mark.slow
    def test_training_step_and_posneg_eval(self, loaders):
        train_loader, _, test_loader = loaders
        model = MoseiDynMMNetV2()
        batch = next(iter(train_loader))
        variables = model.init(
            jax.random.PRNGKey(0),
            [jnp.asarray(x) for x in batch.inputs],
            [jnp.asarray(l) for l in batch.lengths],
        )
        cfg = SupervisedConfig(
            task="posneg-classification",
            objective="l1",
            epochs=1,
            lr=1e-4,
            weight_decay=1e-4,
            additional_loss=True,
            lossw=0.01,
        )
        trainer = SupervisedTrainer(dynmm_adapter(model, temp=1.0, hard=False), cfg)
        state = trainer.init_state(variables)
        state, loss0 = trainer.train_epoch(state, train_loader, jax.random.PRNGKey(1))
        assert np.isfinite(loss0)
        metrics = trainer.evaluate(state, test_loader, collect_weights=True)
        assert set(metrics) >= {"loss", "accuracy", "corr", "gate_stats"}
        flops = metrics["gate_stats"].expected_flops(MOSEI_FLOPS_M)
        assert MOSEI_FLOPS_M[0] <= flops <= MOSEI_FLOPS_M[1]
