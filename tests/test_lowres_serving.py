"""Quarter-resolution serving output (``low_res=True`` / --output_res quarter).

``low_res=True`` makes the decoder return its native H/4 logits (the
``conv_out`` output — reference model.py:299 before the two x2 upsamples at
model.py:300-308), skipping the tail's dominant HBM traffic. Exactness
invariant: applying the model's OWN upsample1/upsample2 modules to the
low-res logits must reproduce the full-res forward bit-for-bit, for every
serving strategy — proving low_res changes WHERE the upsample runs, not the
math before it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynmm_tpu.models.esanet import ESANet, ESANetConfig
from dynmm_tpu.models.skip_gate import SkipGateESANet
from dynmm_tpu.nn.layers import Upsample

pytestmark = pytest.mark.slow  # full CLI/parity/mesh drive; -m "not slow" skips

CFG = ESANetConfig(
    height=64, width=64, num_classes=5,
    encoder_rgb="resnet18", encoder_depth="resnet18",
    encoder_block="BasicBlock",
    channels_decoder=(32, 32, 32), nr_decoder_blocks=(1, 1, 1),
    fuse_depth_in_rgb_encoder="SE-add", context_module="ppm",
    upsampling="learned-3x3-zeropad",
)


@pytest.fixture(scope="module")
def setup():
    model = SkipGateESANet(CFG)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.standard_normal((4, 64, 64, 3)).astype(np.float32))
    depth = jnp.asarray(rng.standard_normal((4, 64, 64, 1)).astype(np.float32))
    variables = dict(
        model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    )
    return model, variables, rgb, depth


def apply_upsample_tail(variables, low):
    """The model's own upsample1 -> upsample2 applied standalone."""
    up = Upsample(mode=CFG.upsampling, channels=CFG.num_classes)
    p = variables["params"]["decoder"]
    out = up.apply({"params": p["upsample1"]}, low)
    return up.apply({"params": p["upsample2"]}, out)


@pytest.mark.parametrize(
    "mode", ["dense", "batchmax", "compact", "switch"]
)
def test_lowres_tail_equals_fullres(setup, mode):
    model, variables, rgb, depth = setup
    if mode == "switch":  # batch=1 contract
        rgb, depth = rgb[:1], depth[:1]

    def run(low_res):
        if mode == "dense":
            return model.apply(
                variables, rgb, depth, train=False, hard=True,
                low_res=low_res,
            )
        method = {
            "batchmax": model.forward_switch_batched,
            "compact": model.forward_routed_compact,
            "switch": model.forward_switch,
        }[mode]
        return model.apply(
            variables, rgb, depth, low_res=low_res, method=method
        )

    full = run(low_res=False)
    low = run(low_res=True)
    assert low.shape == (rgb.shape[0], 16, 16, CFG.num_classes)
    np.testing.assert_allclose(
        np.asarray(apply_upsample_tail(variables, low)),
        np.asarray(full), atol=1e-6, rtol=1e-6,
    )


def test_lowres_static_esanet(setup):
    """The static baseline model supports the same serving knob."""
    _, variables, rgb, depth = setup
    model = ESANet(CFG)  # same param tree as SkipGateESANet minus the gate
    full = model.apply(variables, rgb, depth, train=False)
    low = model.apply(variables, rgb, depth, train=False, low_res=True)
    assert low.shape == (4, 16, 16, CFG.num_classes)
    np.testing.assert_allclose(
        np.asarray(apply_upsample_tail(variables, low)),
        np.asarray(full), atol=1e-6, rtol=1e-6,
    )


def test_train_mode_ignores_lowres(setup):
    """Training must stay full-res (multi-scale supervision contract)."""
    model, variables, rgb, depth = setup
    out = model.apply(
        variables, rgb, depth, train=True, temp=1.0, low_res=True,
        rngs={"gumbel": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )[0]
    pred = out[0][0] if isinstance(out[0], (tuple, list)) else out[0]
    assert pred.shape[1] == 64  # full resolution despite low_res=True


def test_lowres_one_modality():
    """ESANetOneModality (--modality rgb/depth) supports the serving knob —
    the trainer's static eval step passes low_res unconditionally
    (train/seg.py::_get_eval_step), so every static model must accept it."""
    from dynmm_tpu.models.one_modality import ESANetOneModality

    model = ESANetOneModality(CFG, input_channels=3)
    rng = np.random.default_rng(1)
    rgb = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    variables = dict(model.init(jax.random.PRNGKey(0), rgb, train=False))
    full = model.apply(variables, rgb, train=False)
    low = model.apply(variables, rgb, train=False, low_res=True)
    assert low.shape == (2, 16, 16, CFG.num_classes)
    np.testing.assert_allclose(
        np.asarray(apply_upsample_tail(variables, low)),
        np.asarray(full), atol=1e-6, rtol=1e-6,
    )
