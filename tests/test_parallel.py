"""Multi-device tests on the 8-device virtual CPU mesh: sharding specs,
data-parallel gradient equivalence, and a sharded train step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dynmm_tpu.models.esanet import ESANetConfig
from dynmm_tpu.models.skip_gate import SkipGateESANet
from dynmm_tpu.parallel import make_mesh, replicate, shard_batch, shard_params
from dynmm_tpu.train.seg_losses import multiscale_ce

pytestmark = pytest.mark.slow  # full CLI/parity/mesh drive; -m "not slow" skips

TINY = ESANetConfig(
    height=32, width=32, num_classes=3,
    encoder_rgb="resnet18", encoder_depth="resnet18",
    encoder_block="BasicBlock",
    channels_decoder=(16, 16, 16), nr_decoder_blocks=(1, 1, 1),
    fuse_depth_in_rgb_encoder="add", upsampling="bilinear",
    context_module="None",
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(4, 2)


class TestMeshHelpers:
    def test_mesh_shape(self, mesh):
        assert dict(mesh.shape) == {"data": 4, "model": 2}

    def test_shard_batch_places_on_data_axis(self, mesh):
        x = np.zeros((8, 4, 4, 3), np.float32)
        sharded = shard_batch(x, mesh)
        spec = sharded.sharding.spec
        assert spec[0] == "data"

    def test_shard_params_wide_kernels_on_model_axis(self, mesh):
        params = {
            "big": {"kernel": jnp.zeros((3, 3, 64, 256))},
            "small": {"kernel": jnp.zeros((3, 3, 8, 16))},
            "bias": {"bias": jnp.zeros(256)},
        }
        out = shard_params(params, mesh, min_out=128)
        assert out["big"]["kernel"].sharding.spec == P(None, None, None, "model")
        assert out["small"]["kernel"].sharding.spec == P()
        assert out["bias"]["bias"].sharding.spec == P()


class TestShardedTraining:
    def test_dp_train_step_runs_and_matches_single_device(self, mesh):
        """One SGD step on the 4x2 mesh must match the unsharded step."""
        model = SkipGateESANet(TINY)
        batch = 4
        rng = np.random.default_rng(0)
        rgb = jnp.asarray(rng.standard_normal((batch, 32, 32, 3)).astype(np.float32))
        depth = jnp.asarray(rng.standard_normal((batch, 32, 32, 1)).astype(np.float32))
        labels = [
            jnp.asarray(rng.integers(0, 4, (batch, 32, 32)).astype(np.int32)),
            jnp.asarray(rng.integers(0, 4, (batch, 4, 4)).astype(np.int32)),
            jnp.asarray(rng.integers(0, 4, (batch, 2, 2)).astype(np.int32)),
            jnp.asarray(rng.integers(0, 4, (batch, 1, 1)).astype(np.int32)),
        ]
        class_weights = jnp.ones(3)
        variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        tx = optax.sgd(1e-2)
        opt_state = tx.init(params)

        def step(params, model_state, opt_state, rgb, depth):
            def loss_fn(p):
                (preds, loss_flop), new_state = model.apply(
                    {"params": p, **model_state}, rgb, depth, train=True,
                    mutable=["batch_stats"],
                )
                loss, _ = multiscale_ce(preds, labels, class_weights)
                return loss + 1e-4 * loss_flop, new_state

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), loss

        # single-device reference
        ref_params, ref_loss = jax.jit(step)(
            params, model_state, opt_state, rgb, depth
        )

        # sharded
        s_params = shard_params(params, mesh, min_out=64)
        s_state = replicate(model_state, mesh)
        s_opt = replicate(opt_state, mesh)
        s_rgb, s_depth = shard_batch((rgb, depth), mesh)
        with jax.set_mesh(mesh):
            new_params, loss = jax.jit(step)(s_params, s_state, s_opt, s_rgb, s_depth)

        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
        a = jax.tree_util.tree_leaves(ref_params)
        b = jax.tree_util.tree_leaves(new_params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=2e-3, atol=1e-5
            )
