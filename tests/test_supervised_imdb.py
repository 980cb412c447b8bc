"""End-to-end test of the modality-level DynMM slice: IMDB router + generic
supervised trainer on synthetic data. Mirrors the reference workflow
(imdb_dyn.py): train with soft gates + λ resource loss, eval with hard gates,
report f1 + expected FLOPs + branch ratio.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynmm_tpu.core.resource import GateStats
from dynmm_tpu.data.imdb import synthetic_imdb_loaders
from dynmm_tpu.models.modality import IMDBDynMMNet, IMDB_FLOPS_M
from dynmm_tpu.train.adapters import dynmm_adapter
from dynmm_tpu.train.supervised import SupervisedConfig, SupervisedTrainer


@pytest.fixture(scope="module")
def loaders():
    return synthetic_imdb_loaders(n_train=128, n_valid=64, batch_size=32)


@pytest.fixture(scope="module")
def model_and_vars(loaders):
    train_loader, _, _ = loaders
    model = IMDBDynMMNet()
    batch = next(iter(train_loader))
    variables = model.init(
        jax.random.PRNGKey(0), [jnp.asarray(x) for x in batch.inputs]
    )
    return model, variables


class TestIMDBDynMMNet:
    def test_forward_contract(self, model_and_vars, loaders):
        model, variables = model_and_vars
        batch = next(iter(loaders[0]))
        out, resource, w = model.apply(
            variables, [jnp.asarray(x) for x in batch.inputs], hard=True
        )
        assert out.shape == (32, 23)
        assert w.shape == (32, 2)
        assert 0.0 <= float(resource) <= 1.0

    def test_infer_mode_forces_branch(self, model_and_vars, loaders):
        model, variables = model_and_vars
        batch = next(iter(loaders[0]))
        inputs = [jnp.asarray(x) for x in batch.inputs]
        out1, r1, _ = model.apply(variables, inputs, infer_mode=1)
        direct = model.apply(variables, inputs, 1, method=model.forward_branch)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(direct), rtol=1e-5)
        assert float(r1) == 0.0

    def test_switch_matches_dense_hard(self, model_and_vars, loaders):
        model, variables = model_and_vars
        batch = next(iter(loaders[0]))
        inputs = [jnp.asarray(x[:1]) for x in batch.inputs]
        dense, _, w = model.apply(variables, inputs, hard=True)
        switched, w2 = model.apply(variables, inputs, method=model.forward_switch)
        np.testing.assert_allclose(np.asarray(dense), np.asarray(switched), rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(w), np.asarray(w2))


class TestEndToEndTraining:
    @pytest.mark.slow
    def test_loss_decreases_and_eval_pipeline(self, loaders):
        train_loader, valid_loader, test_loader = loaders
        model = IMDBDynMMNet()
        batch = next(iter(train_loader))
        variables = model.init(
            jax.random.PRNGKey(0), [jnp.asarray(x) for x in batch.inputs]
        )

        cfg = SupervisedConfig(
            task="multilabel",
            objective="bce_with_logits",
            epochs=3,
            lr=1e-3,
            weight_decay=0.01,
            lossw=0.0,
            additional_loss=True,
        )
        trainer = SupervisedTrainer(
            dynmm_adapter(model, temp=1.0, hard=False), cfg
        )
        state = trainer.init_state(variables)

        state, loss0 = trainer.train_epoch(state, train_loader, jax.random.PRNGKey(1))
        state, loss1 = trainer.train_epoch(state, train_loader, jax.random.PRNGKey(2))
        state, loss2 = trainer.train_epoch(state, train_loader, jax.random.PRNGKey(3))
        assert loss2 < loss0, (loss0, loss1, loss2)

        # hard-gate eval with gate statistics (the reference's eval protocol)
        hard_trainer = SupervisedTrainer(
            dynmm_adapter(model, temp=1.0, hard=True), cfg
        )
        hard_trainer.tx = trainer.tx
        metrics = hard_trainer.evaluate(state, test_loader, collect_weights=True)
        assert set(metrics) >= {"loss", "f1_micro", "f1_macro", "gate_stats"}
        stats: GateStats = metrics["gate_stats"]
        assert stats.weights.shape[1] == 2
        flops = stats.expected_flops(IMDB_FLOPS_M)
        assert IMDB_FLOPS_M[0] <= flops <= IMDB_FLOPS_M[1]

    def test_freeze_keeps_branches_fixed(self, loaders):
        """--freeze: only gate params update (imdb_dyn.py:52-57 +
        Supervised_Learning.py:97)."""
        train_loader, _, _ = loaders
        model = IMDBDynMMNet()
        batch = next(iter(train_loader))
        variables = model.init(
            jax.random.PRNGKey(0), [jnp.asarray(x) for x in batch.inputs]
        )
        cfg = SupervisedConfig(
            task="multilabel", objective="bce_with_logits", epochs=1,
            lr=1e-2, additional_loss=True, lossw=0.1,
        )
        trainer = SupervisedTrainer(
            dynmm_adapter(model, temp=1.0, hard=False),
            cfg,
            trainable_pred=lambda path: "gate" in path,
        )
        state = trainer.init_state(variables)
        before = jax.tree_util.tree_map(np.asarray, state["params"])
        state, _ = trainer.train_epoch(state, train_loader, jax.random.PRNGKey(1))
        after = state["params"]

        # gate moved
        g0 = np.asarray(jax.tree_util.tree_leaves(before["gate"])[0])
        g1 = np.asarray(jax.tree_util.tree_leaves(after["gate"])[0])
        assert not np.allclose(g0, g1)
        # branches frozen
        for key in ("text_encoder", "branch3"):
            b0 = jax.tree_util.tree_leaves(before[key])
            b1 = jax.tree_util.tree_leaves(after[key])
            for a, b in zip(b0, b1):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
