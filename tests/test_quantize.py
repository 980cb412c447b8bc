"""int8 PTQ serving path (nn/quant.py + utils/quantize.py).

Covers: QConv int8 algebra vs a numpy emulation, variable-layout identity
with the float modules (checkpoint interchangeability), calibration driver
semantics, and end-to-end agreement of a quantized tiny flagship vs its
float twin on every serving forward strategy.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynmm_tpu.nn.layers import ConvBNAct
from dynmm_tpu.nn.quant import (CALIB_PERCENTILES, QConv,
                                quantize_symmetric, weight_scales)
from dynmm_tpu.utils.quantize import (calibrate, pack_weights, quant_sanity,
                                      select_scales)


def _np_quant_conv(x, w, b, s_in):
    """Numpy emulation of QConv's int8 path (1x1 conv = matmul)."""
    s_w = np.maximum(np.abs(w).reshape(-1, w.shape[-1]).max(axis=0) / 127.0,
                     1e-12)
    xq = np.clip(np.round(x / s_in), -127, 127).astype(np.int32)
    wq = np.clip(np.round(w / s_w), -127, 127).astype(np.int32)
    acc = np.einsum("nhwc,co->nhwo", xq, wq[0, 0].astype(np.int32))
    return acc.astype(np.float32) * (s_in * s_w) + b


def test_qconv_int8_matches_numpy(rng):
    x = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    w = rng.standard_normal((1, 1, 8, 16)).astype(np.float32) * 0.3
    b = rng.standard_normal(16).astype(np.float32)
    s_in = float(np.abs(x).max() / 127.0)

    conv = QConv(features=16, kernel_size=(1, 1), padding=((0, 0), (0, 0)),
                 quant="int8")
    variables = {
        "params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
        "quant": {"in_scale": jnp.float32(s_in)},
    }
    out = conv.apply(variables, jnp.asarray(x))
    ref = _np_quant_conv(x, w, b, s_in)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_qconv_calib_accumulates_absmax(rng):
    conv = QConv(features=4, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                 quant="calib")
    x1 = jnp.asarray(rng.standard_normal((1, 4, 4, 4)).astype(np.float32))
    x2 = 3.0 * x1
    v = conv.init(jax.random.PRNGKey(0), x1)
    assert float(v["quant"]["in_scale"]) == 0.0
    _, m1 = conv.apply(v, x1, mutable=["quant"])
    s1 = float(m1["quant"]["in_scale"])
    assert s1 == pytest.approx(float(jnp.abs(x1).max()) / 127.0)
    # running max: a later smaller batch must not shrink the scale
    _, m2 = conv.apply({**v, **m1}, x2, mutable=["quant"])
    _, m3 = conv.apply({**v, **m2}, 0.1 * x1, mutable=["quant"])
    assert float(m3["quant"]["in_scale"]) == pytest.approx(3 * s1)


def test_qconv_float_calib_path_matches_nn_conv(rng):
    """The calib-mode float conv must equal nn.Conv exactly (same math)."""
    import flax.linen as nn

    x = jnp.asarray(rng.standard_normal((2, 6, 6, 3)).astype(np.float32))
    ref_conv = nn.Conv(8, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    v = ref_conv.init(jax.random.PRNGKey(1), x)
    qconv = QConv(features=8, kernel_size=(3, 3), strides=(2, 2),
                  padding=((1, 1), (1, 1)), quant="calib")
    out, _ = qconv.apply(v, x, mutable=["quant"])
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_conv.apply(v, x)),
        rtol=1e-6, atol=1e-6)


def test_convbnact_param_layout_identical(rng):
    """Float-trained params load unchanged into calib/int8 modules."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    vf = ConvBNAct(8, 3).init(jax.random.PRNGKey(0), x)
    for mode in ("calib", "int8"):
        vq = ConvBNAct(8, 3, quant=mode).init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(
            vf["params"]) == jax.tree_util.tree_structure(vq["params"])
        assert all(
            a.shape == b.shape for a, b in zip(
                jax.tree_util.tree_leaves(vf["params"]),
                jax.tree_util.tree_leaves(vq["params"])))
        assert "quant" in vq


def test_convbnact_int8_close_to_float(rng):
    """Calibrated int8 ConvBNAct ~ float ConvBNAct (eval mode)."""
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    vf = ConvBNAct(16, 3).init(jax.random.PRNGKey(2), x)
    q = calibrate(ConvBNAct(16, 3, quant="calib"), vf, [(x,)], train=False)
    assert quant_sanity(q) == 1
    out_q = ConvBNAct(16, 3, quant="int8").apply(
        {**vf, "quant": q}, x, train=False)
    out_f = ConvBNAct(16, 3).apply(vf, x, train=False)
    err = float(jnp.linalg.norm(out_q - out_f) / jnp.linalg.norm(out_f))
    assert err < 0.02, err


def test_calib_records_percentile_grid(rng):
    """Calibration accumulates in_pct alongside in_scale; each percentile
    scale lower-bounds abs-max and the grid is monotone in p."""
    conv = QConv(features=4, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                 quant="calib")
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)).astype(np.float32))
    v = conv.init(jax.random.PRNGKey(0), x)
    _, m = conv.apply(v, x, mutable=["quant"])
    s_abs = float(m["quant"]["in_scale"])
    pct = np.asarray(m["quant"]["in_pct"])
    assert pct.shape == (len(CALIB_PERCENTILES),)
    assert np.all(np.diff(pct) >= 0)  # monotone in p
    assert pct[-1] <= s_abs + 1e-12
    ref = np.quantile(np.abs(np.asarray(x)).ravel(),
                      np.asarray(CALIB_PERCENTILES) / 100.0) / 127.0
    np.testing.assert_allclose(pct, ref, rtol=1e-4, atol=1e-7)


def test_select_scales_percentile_swaps_in_scale(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    vf = ConvBNAct(16, 3).init(jax.random.PRNGKey(2), x)
    q = calibrate(ConvBNAct(16, 3, quant="calib"), vf, [(x,)], train=False)
    assert quant_sanity(q) == 1  # in_pct grids must NOT inflate the count
    q_abs = select_scales(q, "absmax")
    assert q_abs is q
    for p in CALIB_PERCENTILES:
        qp = select_scales(q, "percentile", percentile=p)
        leaf = [v for k, v in jax.tree_util.tree_flatten_with_path(qp)[0]
                if getattr(k[-1], "key", None) == "in_scale"]
        assert len(leaf) == 1 and float(leaf[0]) > 0
        # int8 forward runs with the swapped scales and stays close
        out_q = ConvBNAct(16, 3, quant="int8").apply(
            {**vf, "quant": qp}, x, train=False)
        out_f = ConvBNAct(16, 3).apply(vf, x, train=False)
        err = float(jnp.linalg.norm(out_q - out_f)
                    / jnp.linalg.norm(out_f))
        # p=99.0 saturates 1% of a Gaussian input by design — the loose
        # bound just certifies the swapped scales produce a sane forward
        assert err < 0.10, (p, err)
    with pytest.raises(ValueError):
        select_scales(q, "percentile", percentile=95.0)
    with pytest.raises(ValueError):
        select_scales(q, "entropy")


def test_pack_weights_bit_exact(rng):
    """Load-time weight packing == in-graph weight quantization, bit for
    bit (same weight_scales/quantize_symmetric algebra, run once)."""
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    vf = ConvBNAct(16, 3).init(jax.random.PRNGKey(2), x)
    q = calibrate(ConvBNAct(16, 3, quant="calib"), vf, [(x,)], train=False)
    v = {**vf, "quant": q}
    model_q = ConvBNAct(16, 3, quant="int8")
    out_a = model_q.apply(v, x, train=False)
    vp = pack_weights(v)
    kernels = [leaf for path, leaf
               in jax.tree_util.tree_flatten_with_path(vp["params"])[0]
               if getattr(path[-1], "key", None) == "kernel"]
    assert any(k.dtype == jnp.int8 for k in kernels)
    # per-channel scales stored; calib stats preserved
    flat = {getattr(p[-1], "key", None)
            for p, _ in jax.tree_util.tree_flatten_with_path(vp["quant"])[0]}
    assert {"w_scale", "in_scale", "in_pct"} <= flat
    out_b = model_q.apply(vp, x, train=False)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    # idempotent: re-packing a packed tree is a no-op
    vpp = pack_weights(vp)
    np.testing.assert_array_equal(
        np.asarray(model_q.apply(vpp, x, train=False)), np.asarray(out_b))


def test_weight_scales_and_quantize_symmetric():
    w = jnp.asarray([[[[1.0, -2.0], [0.5, 0.25]]]])  # (1,1,2,2)
    s = weight_scales(w)
    np.testing.assert_allclose(np.asarray(s), [1.0 / 127, 2.0 / 127])
    q = quantize_symmetric(w, s[None, None, None, :])
    assert q.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(q)[0, 0], [[127, -127], [64, 16]])


@pytest.fixture(scope="module")
def tiny_cfg():
    from dynmm_tpu.models.esanet import ESANetConfig

    return ESANetConfig(
        height=64, width=64, num_classes=5,
        encoder_rgb="resnet18", encoder_depth="resnet18",
        encoder_block="NonBottleneck1D",
        channels_decoder=(32, 24, 16), nr_decoder_blocks=(1, 1, 1),
        fuse_depth_in_rgb_encoder="SE-add",
        upsampling="learned-3x3-zeropad",
    )


def _tiny_inputs(rng, bs=2, h=64, w=64):
    rgb = rng.standard_normal((bs, h, w, 3)).astype(np.float32)
    depth = rng.standard_normal((bs, h, w, 1)).astype(np.float32)
    return jnp.asarray(rgb), jnp.asarray(depth)


@pytest.mark.slow
def test_flagship_int8_serving_all_strategies(rng, tiny_cfg):
    """Quantized SkipGateESANet: every serving strategy runs, agrees with
    its float twin, and the gate decisions are preserved."""
    from dynmm_tpu.models.skip_gate import SkipGateESANet

    rgb, depth = _tiny_inputs(rng)
    model_f = SkipGateESANet(tiny_cfg)
    vf = model_f.init(jax.random.PRNGKey(0), rgb, depth, train=False)

    cfg_c = dataclasses.replace(tiny_cfg, quant="calib")
    cfg_q = dataclasses.replace(tiny_cfg, quant="int8")
    qcoll = calibrate(SkipGateESANet(cfg_c), vf, [(rgb, depth)],
                      train=False, hard=True)
    assert quant_sanity(qcoll) > 30  # encoders + decoder + skips + conv_out

    model_q = SkipGateESANet(cfg_q)
    vq = {**vf, "quant": qcoll}

    out_f = model_f.apply(vf, rgb, depth, train=False, hard=True)
    out_q = model_q.apply(vq, rgb, depth, train=False, hard=True)
    assert out_q.shape == out_f.shape
    err = float(jnp.linalg.norm(out_q - out_f) / jnp.linalg.norm(out_f))
    assert err < 0.12, err
    agree = float(
        (jnp.argmax(out_q, -1) == jnp.argmax(out_f, -1)).mean())
    assert agree > 0.85, agree

    # gate decisions must be identical (the gate is never quantized)
    _, w_f = model_f.apply(vf, rgb, depth, train=False, hard=True,
                           return_weight=True)
    _, w_q = model_q.apply(vq, rgb, depth, train=False, hard=True,
                           return_weight=True)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(w_f, -1)), np.asarray(jnp.argmax(w_q, -1)))

    # load-time weight packing: bit-exact on the full flagship, and the
    # packed tree drives every strategy below in place of the in-graph form
    vq = pack_weights(vq)
    out_packed = model_q.apply(vq, rgb, depth, train=False, hard=True)
    np.testing.assert_array_equal(np.asarray(out_packed), np.asarray(out_q))

    # routed strategies execute under int8 and match their own dense-hard
    bs = rgb.shape[0]
    routed = model_q.apply(vq, rgb, depth, caps=(0, bs // 2, bs),
                           method=model_q.forward_routed_compact)
    np.testing.assert_allclose(
        np.asarray(routed), np.asarray(out_q), rtol=2e-2, atol=2e-2)
    batched = model_q.apply(vq, rgb, depth,
                            method=model_q.forward_switch_batched)
    assert batched.shape == out_q.shape


def test_flagship_quant_param_layout_identical(rng, tiny_cfg):
    from dynmm_tpu.models.skip_gate import SkipGateESANet

    rgb, depth = _tiny_inputs(rng, bs=1)
    vf = SkipGateESANet(tiny_cfg).init(
        jax.random.PRNGKey(0), rgb, depth, train=False)
    cfg_q = dataclasses.replace(tiny_cfg, quant="int8")
    vq = SkipGateESANet(cfg_q).init(
        jax.random.PRNGKey(0), rgb, depth, train=False)
    assert jax.tree_util.tree_structure(
        vf["params"]) == jax.tree_util.tree_structure(vq["params"])
