"""Import/export round-trip completeness: every parameter and running stat of
the full SkipGateESANet must survive flax → torch state_dict → flax with
identical values. This proves the key-translation rules cover the whole
architecture (the precondition for loading real reference checkpoints)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynmm_tpu.models.esanet import ESANetConfig
from dynmm_tpu.models.skip_gate import SkipGateESANet
from dynmm_tpu.utils.torch_export import export_state_dict, save_torch_checkpoint
from dynmm_tpu.utils.torch_import import import_torch_checkpoint

CFG = ESANetConfig(
    height=64, width=64, num_classes=5,
    encoder_rgb="resnet18", encoder_depth="resnet18",
    encoder_block="NonBottleneck1D",
    channels_decoder=(64, 32, 16), nr_decoder_blocks=(1, 2, 1),
    fuse_depth_in_rgb_encoder="SE-add", upsampling="learned-3x3-zeropad",
    context_module="ppm",
)


def test_full_roundtrip(tmp_path):
    model = SkipGateESANet(CFG)
    rgb = jnp.zeros((1, 64, 64, 3))
    depth = jnp.zeros((1, 64, 64, 1))
    variables = model.init(jax.random.PRNGKey(7), rgb, depth, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    # randomize so "unchanged" can't accidentally pass
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(0)
    rand_params = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32))
                  for l in leaves]
    )
    s_leaves, s_def = jax.tree_util.tree_flatten(stats)
    rand_stats = jax.tree_util.tree_unflatten(
        s_def, [jnp.asarray(rng.random(l.shape).astype(np.float32) + 0.5)
                for l in s_leaves]
    )

    path = str(tmp_path / "export.pth")
    save_torch_checkpoint(path, rand_params, rand_stats)

    # strict import: every torch key must land on a leaf
    new_params, new_state = import_torch_checkpoint(
        path, params, {"batch_stats": stats}, strict=True
    )

    for a, b in zip(
        jax.tree_util.tree_leaves(rand_params),
        jax.tree_util.tree_leaves(new_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(rand_stats),
        jax.tree_util.tree_leaves(new_state["batch_stats"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # export covers every leaf (params + stats) exactly once
    sd = export_state_dict(rand_params, rand_stats)
    n_leaves = len(jax.tree_util.tree_leaves(rand_params)) + len(
        jax.tree_util.tree_leaves(rand_stats)
    )
    assert len(sd) == n_leaves


def test_forward_identical_after_roundtrip(tmp_path):
    """Logits must match exactly between original and round-tripped params."""
    model = SkipGateESANet(CFG)
    rng = np.random.default_rng(1)
    rgb = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    depth = jnp.asarray(rng.standard_normal((1, 64, 64, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)

    path = str(tmp_path / "rt.pth")
    save_torch_checkpoint(path, variables["params"], variables["batch_stats"])
    new_params, new_state = import_torch_checkpoint(
        path, variables["params"], {"batch_stats": variables["batch_stats"]},
        strict=True,
    )
    out_a = model.apply(variables, rgb, depth, train=False, hard=True)
    out_b = model.apply(
        {"params": new_params, **new_state}, rgb, depth, train=False, hard=True
    )
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-6)
