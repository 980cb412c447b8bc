"""Mesh-sharded VALIDATION and sharded-checkpoint round-trip (VERDICT r2
item 7; SURVEY §5.8).

``dryrun_multichip`` covers the sharded training step; these tests cover the
other half of the scale-out story on the 8-device virtual CPU mesh:

* per-camera mIoU validation with batches sharded over 'data' must equal the
  single-device validation result for the same state, and
* an orbax save of a mesh-sharded training state must restore DIRECTLY onto
  the original shardings (no host gather) with identical values.
"""

import numpy as np
import pytest

import jax

from dynmm_tpu.models.skip_gate import SkipGateESANet
from dynmm_tpu.parallel import make_mesh, shard_params
from dynmm_tpu.train.seg import SegTrainConfig, SegTrainer
from dynmm_tpu.utils.checkpoint import load_orbax, save_orbax
from tests.test_seg_training import SMALL, make_loaders

pytestmark = pytest.mark.slow  # full CLI/parity/mesh drive; -m "not slow" skips


@pytest.fixture(scope="module")
def trained_state():
    """One mesh train epoch → a genuinely sharded state to eval/checkpoint."""
    train_loader, valid_loader = make_loaders(n_train=8, n_test=4, batch=4)
    mesh = make_mesh(4, 2)
    cfg = SegTrainConfig(epochs=1, lr=0.01, loss_ratio=1e-4, dynamic=True)
    model = SkipGateESANet(SMALL)
    trainer = SegTrainer(model, cfg, np.ones(5, np.float32), mesh=mesh)
    state = trainer.init_state(
        jax.random.PRNGKey(0), next(iter(train_loader))
    )
    state, _ = trainer.train_one_epoch(state, train_loader, 0, 0.01, 1.0)
    return model, cfg, mesh, trainer, state, valid_loader


def test_mesh_validation_matches_single_device(trained_state):
    model, cfg, mesh, trainer, state, valid_loader = trained_state
    miou_mesh, logs = trainer.validate(state, valid_loader)
    assert "kv1" in miou_mesh and np.isfinite(miou_mesh["kv1"])

    # same state, single-device trainer → same per-camera mIoU
    host_state = jax.tree_util.tree_map(np.asarray, state)
    single = SegTrainer(model, cfg, np.ones(5, np.float32))
    miou_single, _ = single.validate(host_state, valid_loader)
    assert miou_mesh.keys() == miou_single.keys()
    for cam in miou_mesh:
        np.testing.assert_allclose(
            miou_mesh[cam], miou_single[cam], rtol=1e-6,
            err_msg=f"camera {cam}",
        )


def test_orbax_sharded_roundtrip(tmp_path, trained_state):
    model, cfg, mesh, trainer, state, valid_loader = trained_state
    path = str(tmp_path / "orbax_sharded")
    save_orbax(path, state, epoch=3)

    # the state itself supplies structure + shardings (values are not read:
    # orbax restores each leaf directly onto the given sharding)
    payload = load_orbax(path, target=state)
    assert int(payload["epoch"]) == 3
    restored = payload["state"]

    # every leaf: values equal AND shardings preserved shard-for-shard
    flat_src = jax.tree_util.tree_leaves_with_path(state)
    flat_dst = dict(jax.tree_util.tree_leaves_with_path(restored))
    checked_sharded = 0
    for path_k, src in flat_src:
        dst = flat_dst[path_k]
        np.testing.assert_array_equal(np.asarray(dst), np.asarray(src))
        if isinstance(src, jax.Array) and isinstance(dst, jax.Array):
            assert dst.sharding.is_equivalent_to(src.sharding, src.ndim), (
                path_k
            )
            if not src.sharding.is_fully_replicated:
                checked_sharded += 1
    assert checked_sharded > 10  # wide kernels really were sharded

    # restored state is live: one eval pass under the mesh
    miou, _ = trainer.validate(restored, valid_loader)
    assert np.isfinite(miou["kv1"])
