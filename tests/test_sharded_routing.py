"""Device-local adaptive routing under shard_map (8-device virtual CPU mesh
via conftest): results must match the single-device batched routed forward,
and each shard's skip decision must be independent (an all-easy shard's
device skips even when another shard is hard — verified by equality with
per-shard single-device runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynmm_tpu.models.esanet import ESANetConfig
from dynmm_tpu.models.skip_gate import SkipGateESANet
from dynmm_tpu.parallel.mesh import make_mesh
from dynmm_tpu.parallel.routing import make_sharded_routed_forward

pytestmark = pytest.mark.slow  # full CLI/parity/mesh drive; -m "not slow" skips

H = W = 64


@pytest.fixture(scope="module")
def setup():
    cfg = ESANetConfig(
        height=H, width=W, num_classes=5,
        encoder_rgb="resnet18", encoder_depth="resnet18",
        encoder_block="BasicBlock",
        channels_decoder=(32, 32, 32), nr_decoder_blocks=(1, 1, 1),
        context_module="None", upsampling="bilinear",
        fuse_depth_in_rgb_encoder="SE-add",
    )
    model = SkipGateESANet(cfg)
    rng = np.random.default_rng(0)
    bs = 8
    rgb = jnp.asarray(rng.standard_normal((bs, H, W, 3)).astype(np.float32))
    depth = jnp.asarray(rng.standard_normal((bs, H, W, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    return model, variables, rgb, depth


class TestShardedRouting:
    def test_matches_single_device(self, setup):
        model, variables, rgb, depth = setup
        assert jax.device_count() >= 4
        mesh = make_mesh(n_data=4)
        fn = make_sharded_routed_forward(model, mesh)
        out = fn(variables, rgb, depth)

        ref = model.apply(variables, rgb, depth,
                          method=model.forward_switch_batched)
        # shard-local k_max can differ from global k_max, but per-sample
        # MIXING is identical to dense hard eval in both, so results match
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)

    def test_shard_decisions_are_local(self, setup):
        """Each shard's output equals running that shard alone on one
        device — no cross-shard coupling through k_max."""
        model, variables, rgb, depth = setup
        mesh = make_mesh(n_data=4)
        fn = make_sharded_routed_forward(model, mesh)
        out = np.asarray(fn(variables, rgb, depth))
        for s in range(4):
            sl = slice(2 * s, 2 * s + 2)
            solo = model.apply(variables, rgb[sl], depth[sl],
                               method=model.forward_switch_batched)
            np.testing.assert_allclose(
                out[sl], np.asarray(solo), rtol=2e-4, atol=2e-4)

    def test_compact_method_under_mesh(self, setup):
        model, variables, rgb, depth = setup
        mesh = make_mesh(n_data=4)
        fn = make_sharded_routed_forward(
            model, mesh, method_name="forward_routed_compact")
        out = fn(variables, rgb, depth)
        ref = model.apply(variables, rgb, depth, train=False, hard=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
