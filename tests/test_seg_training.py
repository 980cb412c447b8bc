"""End-to-end segmentation-stack tests on synthetic data: SegTrainer fit
(train → validate → checkpoint → resume), eval noise injection, local-gate and
one-modality variants, mirrored CLI debug flow."""

import os

import jax
import numpy as np
import pytest

from dynmm_tpu.data.nyuv2 import SyntheticSegDataset
from dynmm_tpu.data.seg_preprocessing import SegLoader, SegPreprocessor
from dynmm_tpu.models.esanet import ESANetConfig
from dynmm_tpu.models.skip_gate import SkipGateESANet
from dynmm_tpu.models.skip_local import SkipESANet
from dynmm_tpu.models.one_modality import ESANetOneModality
from dynmm_tpu.train.seg import SegTrainConfig, SegTrainer

pytestmark = pytest.mark.slow  # full CLI/parity/mesh drive; -m "not slow" skips

H = W = 64
SMALL = ESANetConfig(
    height=H, width=W, num_classes=5,
    encoder_rgb="resnet18", encoder_depth="resnet18",
    encoder_block="BasicBlock",
    channels_decoder=(32, 32, 32), nr_decoder_blocks=(1, 1, 1),
    fuse_depth_in_rgb_encoder="add", upsampling="bilinear",
    context_module="None",
)


def make_loaders(n_train=4, n_test=2, batch=2):
    train_ds = SyntheticSegDataset(n=n_train, height=H, width=W, n_classes=5, split="train")
    test_ds = SyntheticSegDataset(n=n_test, height=H, width=W, n_classes=5, split="test", seed=7)
    pre_train = SegPreprocessor(2000.0, 800.0, H, W, phase="train")
    pre_test = SegPreprocessor(2000.0, 800.0, H, W, phase="test")
    return (
        SegLoader(train_ds, pre_train, batch_size=batch, shuffle=True, drop_last=True),
        SegLoader(test_ds, pre_test, batch_size=batch),
    )


class TestSegTrainerEndToEnd:
    def test_fit_two_epochs_and_resume(self, tmp_path):
        train_loader, valid_loader = make_loaders()
        cfg = SegTrainConfig(
            epochs=2, lr=0.01, loss_ratio=1e-4, eval_every=1,
            epoch_hard=2, dynamic=True, debug=False,
        )
        model = SkipGateESANet(SMALL)
        trainer = SegTrainer(model, cfg, np.ones(5, np.float32))
        state = trainer.init_state(jax.random.PRNGKey(0), next(iter(train_loader)))
        best_state, best_miou, best_epoch = trainer.fit(
            state, train_loader, valid_loader, str(tmp_path), log_fn=lambda s: None
        )
        assert 0.0 <= best_miou <= 1.0
        assert os.path.exists(tmp_path / "logs.csv")
        assert os.path.exists(tmp_path / "finished.txt")
        ckpts = [f for f in os.listdir(tmp_path) if f.startswith("ckpt_epoch")]
        assert ckpts, "final best checkpoint must exist"

        # resume: load the checkpoint back into a fresh state
        from dynmm_tpu.utils.checkpoint import load_ckpt

        state2 = trainer.init_state(jax.random.PRNGKey(1), next(iter(train_loader)))
        restored, epoch, *_ = load_ckpt(str(tmp_path / ckpts[0]), state2)
        leaves_a = jax.tree_util.tree_leaves(best_state["params"])
        leaves_b = jax.tree_util.tree_leaves(restored["params"])
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_freeze_only_gate_trains(self):
        train_loader, _ = make_loaders()
        cfg = SegTrainConfig(epochs=1, lr=0.1, freeze=True, dynamic=True, loss_ratio=1e-4)
        model = SkipGateESANet(SMALL)
        trainer = SegTrainer(model, cfg, np.ones(5, np.float32))
        state = trainer.init_state(jax.random.PRNGKey(0), next(iter(train_loader)))
        before = jax.tree_util.tree_map(np.asarray, state["params"])
        state, _ = trainer.train_one_epoch(state, train_loader, 0, 0.1, 1.0)
        g0 = np.asarray(jax.tree_util.tree_leaves(before["gate_layer"])[0])
        g1 = np.asarray(jax.tree_util.tree_leaves(state["params"]["gate_layer"])[0])
        assert not np.allclose(g0, g1)
        e0 = jax.tree_util.tree_leaves(before["encoder_rgb"])
        e1 = jax.tree_util.tree_leaves(state["params"]["encoder_rgb"])
        for a, b in zip(e0, e1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_validate_with_noise_runs(self):
        train_loader, valid_loader = make_loaders()
        cfg = SegTrainConfig(dynamic=True, debug=True)
        model = SkipGateESANet(SMALL)
        trainer = SegTrainer(model, cfg, np.ones(5, np.float32))
        state = trainer.init_state(jax.random.PRNGKey(0), next(iter(train_loader)))
        miou_clean, _ = trainer.validate(state, valid_loader, run_seed=0)
        miou_noisy, _ = trainer.validate(
            state, valid_loader, noise_mode=2, noise=5.0, run_seed=0
        )
        assert set(miou_clean) == set(miou_noisy) == {"kv1"}

    def test_grad_accum_steps_every_k_batches(self):
        """cfg.grad_accum wraps the optimizer in optax.MultiSteps: the first
        of every k batches only accumulates (params bit-identical), the
        k-th applies the averaged update."""
        train_loader, _ = make_loaders(n_train=2, batch=2)  # 1 batch/epoch
        cfg = SegTrainConfig(epochs=2, lr=0.1, dynamic=True,
                             loss_ratio=1e-4, grad_accum=2)
        model = SkipGateESANet(SMALL)
        trainer = SegTrainer(model, cfg, np.ones(5, np.float32))
        state = trainer.init_state(
            jax.random.PRNGKey(0), next(iter(train_loader))
        )
        p0 = jax.tree_util.tree_map(np.asarray, state["params"])
        state, _ = trainer.train_one_epoch(state, train_loader, 0, 0.1, 1.0)
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(state["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        state, _ = trainer.train_one_epoch(state, train_loader, 1, 0.1, 1.0)
        changed = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(p0),
                            jax.tree_util.tree_leaves(state["params"]))
        )
        assert changed, "second accumulated batch must apply an update"

    def test_validate_packed_stem_matches_raw(self):
        """cfg.packed_stem host-packs the eval feed (space_to_depth_host);
        the mIoU must equal the raw-input validation exactly."""
        train_loader, valid_loader = make_loaders()
        model = SkipGateESANet(SMALL)
        trainer = SegTrainer(
            model, SegTrainConfig(dynamic=True), np.ones(5, np.float32))
        state = trainer.init_state(
            jax.random.PRNGKey(0), next(iter(train_loader)))
        miou_raw, _ = trainer.validate(state, valid_loader, run_seed=0)
        trainer_p = SegTrainer(
            model, SegTrainConfig(dynamic=True, packed_stem=True),
            np.ones(5, np.float32))
        miou_packed, _ = trainer_p.validate(state, valid_loader, run_seed=0)
        assert miou_packed["kv1"] == pytest.approx(miou_raw["kv1"], abs=1e-6)

    def test_train_step_packed_stem_matches_raw(self):
        """A training step on packed inputs must produce the same updated
        params as the raw feed: the packed conv is the same linear map
        (gradients flow through _s2d_kernel's scatter) and BN sees
        identical activations, so grads/stats/updates coincide."""
        import jax.numpy as jnp

        from dynmm_tpu.models.resnet import space_to_depth_host

        train_loader, _ = make_loaders()
        model = SkipGateESANet(SMALL)
        cfg = SegTrainConfig(epochs=1, lr=0.05, loss_ratio=1e-4, dynamic=True)
        trainer = SegTrainer(model, cfg, np.ones(5, np.float32))
        batch = next(iter(train_loader))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step = trainer._get_train_step((False, False, False))
        targets = [jnp.asarray(batch["label"])] + [
            jnp.asarray(batch["label_down"][r]) for r in (8, 16, 32)
        ]
        sub = jax.random.PRNGKey(7)
        s_raw, *_ = step(state, jnp.asarray(batch["image"]),
                         jnp.asarray(batch["depth"]), targets, 0.05, 1.0, sub)
        s_pk, *_ = step(
            state,
            jnp.asarray(space_to_depth_host(np.asarray(batch["image"]))),
            jnp.asarray(space_to_depth_host(np.asarray(batch["depth"]))),
            targets, 0.05, 1.0, sub,
        )
        for a, b in zip(jax.tree_util.tree_leaves(s_raw["params"]),
                        jax.tree_util.tree_leaves(s_pk["params"])):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)

    def test_noise_seeding_reproducible(self):
        train_loader, valid_loader = make_loaders()
        cfg = SegTrainConfig(dynamic=True, debug=True)
        model = SkipGateESANet(SMALL)
        trainer = SegTrainer(model, cfg, np.ones(5, np.float32))
        state = trainer.init_state(jax.random.PRNGKey(0), next(iter(train_loader)))
        a, _ = trainer.validate(state, valid_loader, noise_mode=0, noise=2.0, run_seed=3)
        b, _ = trainer.validate(state, valid_loader, noise_mode=0, noise=2.0, run_seed=3)
        assert a["kv1"] == b["kv1"]


class TestVariants:
    def test_skip_local_forward(self):
        import jax.numpy as jnp

        model = SkipESANet(SMALL, block_rule=(1, 1, 2, 2))
        rgb = jnp.ones((2, H, W, 3))
        depth = jnp.ones((2, H, W, 1))
        rng = jax.random.PRNGKey(0)
        variables = model.init(jax.random.PRNGKey(1), rgb, depth, rng)
        out, weights = model.apply(
            variables, rgb, depth, rng, hard=True, test=True, return_weights=True
        )
        assert out.shape == (2, H, W, 5)
        assert len(weights) == 4 and weights[0].shape == (2, 2)

    def test_one_modality_forward(self):
        import jax.numpy as jnp

        model = ESANetOneModality(SMALL, input_channels=3, weighting_in_encoder="SE-add")
        x = jnp.ones((2, H, W, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (2, H, W, 5)

    def test_static_esanet_via_trainer(self):
        from dynmm_tpu.models.esanet import ESANet

        train_loader, valid_loader = make_loaders()
        cfg = SegTrainConfig(epochs=1, dynamic=False, debug=True)
        model = ESANet(SMALL)
        trainer = SegTrainer(model, cfg, np.ones(5, np.float32))
        state = trainer.init_state(jax.random.PRNGKey(0), next(iter(train_loader)))
        state, logs = trainer.train_one_epoch(state, train_loader, 0, 0.01, 1.0)
        assert np.isfinite(logs["loss_train_total"])
        miou, _ = trainer.validate(state, valid_loader)
        assert "kv1" in miou
