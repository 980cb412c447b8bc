"""The BASELINE acceptance pipeline, end-to-end on synthetic data: train →
checkpoint → export to the reference's torch format → re-import → evaluate —
mIoU and per-sample hard-gate selections must be IDENTICAL between the native
state and the torch round-trip (the 'identical hard-gate selections'
requirement, exercised without the real dataset)."""

import jax
import numpy as np

from dynmm_tpu.core.resource import GateStats
from dynmm_tpu.models.skip_gate import SkipGateESANet
from dynmm_tpu.train.seg import SegTrainConfig, SegTrainer
from dynmm_tpu.utils.torch_export import save_torch_checkpoint
from dynmm_tpu.utils.torch_import import import_torch_checkpoint
from tests.test_seg_training import SMALL, make_loaders

import pytest

pytestmark = pytest.mark.slow  # full CLI/parity/mesh drive; -m "not slow" skips


def test_torch_roundtrip_preserves_miou_and_gate_selections(tmp_path):
    train_loader, valid_loader = make_loaders(n_train=4, n_test=4, batch=2)
    cfg = SegTrainConfig(epochs=1, lr=0.01, loss_ratio=1e-4, dynamic=True)
    model = SkipGateESANet(SMALL)
    trainer = SegTrainer(model, cfg, np.ones(5, np.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), next(iter(train_loader)))
    state, _ = trainer.train_one_epoch(state, train_loader, 0, 0.01, 1.0)

    # native evaluation
    stats_a = GateStats()
    miou_a, _ = trainer.validate(
        state, valid_loader, run_seed=0, collect_weights=stats_a
    )

    # export → torch format → import
    path = str(tmp_path / "exported.pth")
    save_torch_checkpoint(
        path, state["params"], state["model_state"]["batch_stats"]
    )
    fresh = trainer.init_state(jax.random.PRNGKey(123), next(iter(train_loader)))
    params, model_state = import_torch_checkpoint(
        path, fresh["params"], fresh["model_state"], strict=True
    )
    state_b = {**fresh, "params": params, "model_state": model_state}

    stats_b = GateStats()
    miou_b, _ = trainer.validate(
        state_b, valid_loader, run_seed=0, collect_weights=stats_b
    )

    # identical mIoU and identical per-sample hard-gate selections
    assert miou_a["kv1"] == miou_b["kv1"]
    np.testing.assert_array_equal(
        stats_a.weights.argmax(-1), stats_b.weights.argmax(-1)
    )
    np.testing.assert_allclose(stats_a.weights, stats_b.weights, rtol=1e-6)
