"""SegTrainer on a device mesh: sharded epoch must run and produce finite
losses with the same API as single-device training."""

import jax
import numpy as np

from dynmm_tpu.models.skip_gate import SkipGateESANet
from dynmm_tpu.parallel import make_mesh
from dynmm_tpu.train.seg import SegTrainConfig, SegTrainer
from tests.test_seg_training import SMALL, make_loaders

import pytest

pytestmark = pytest.mark.slow  # full CLI/parity/mesh drive; -m "not slow" skips


def test_mesh_train_epoch():
    train_loader, valid_loader = make_loaders(n_train=8, batch=4)
    mesh = make_mesh(4, 2)
    cfg = SegTrainConfig(epochs=1, lr=0.01, loss_ratio=1e-4, dynamic=True)
    model = SkipGateESANet(SMALL)
    trainer = SegTrainer(model, cfg, np.ones(5, np.float32), mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), next(iter(train_loader)))
    state, logs = trainer.train_one_epoch(state, train_loader, 0, 0.01, 1.0)
    assert np.isfinite(logs["loss_train_total"])
    # params remain addressable and usable for eval on the same mesh topology
    miou, _ = trainer.validate(state, valid_loader)
    assert "kv1" in miou
