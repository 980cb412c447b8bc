"""Tests for nn building blocks: torch numerical parity for conv/BN/SE blocks
(weights copied across frameworks) and behavioral tests for the rest."""

import flax.linen
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from dynmm_tpu.nn import (
    ConvBNAct,
    SqueezeAndExcitation,
    SqueezeAndExciteFusionAdd,
    Upsample,
    max_pool_3x3_s2,
)
from dynmm_tpu.nn.layers import resize_bilinear, resize_nearest


def to_nhwc(x_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def from_nhwc(x) -> np.ndarray:
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


class TestConvBNActTorchParity:
    def test_matches_torch_conv_bn_relu(self, rng):
        """conv(k=3,p=1,no-bias) + BN(eval) + ReLU must match torch bit-for-bit
        (up to float tolerance) after weight transposition."""
        x = rng.standard_normal((2, 8, 10, 12)).astype(np.float32)  # NCHW
        tconv = torch.nn.Conv2d(8, 16, 3, padding=1, bias=False)
        tbn = torch.nn.BatchNorm2d(16)
        with torch.no_grad():
            tbn.running_mean.uniform_(-1, 1)
            tbn.running_var.uniform_(0.5, 2)
            tbn.weight.uniform_(0.5, 1.5)
            tbn.bias.uniform_(-0.5, 0.5)
        tconv.eval(), tbn.eval()
        with torch.no_grad():
            ref = F.relu(tbn(tconv(torch.tensor(x)))).numpy()

        model = ConvBNAct(features=16, kernel_size=3)
        variables = model.init(jax.random.PRNGKey(0), to_nhwc(x))
        variables = {
            "params": {
                "conv": {"kernel": oihw_to_hwio(tconv.weight.detach().numpy())},
                "bn": {
                    "scale": tbn.weight.detach().numpy(),
                    "bias": tbn.bias.detach().numpy(),
                },
            },
            "batch_stats": {
                "bn": {
                    "mean": tbn.running_mean.numpy(),
                    "var": tbn.running_var.numpy(),
                }
            },
        }
        out = model.apply(variables, to_nhwc(x), train=False)
        np.testing.assert_allclose(from_nhwc(out), ref, rtol=1e-4, atol=1e-5)

    def test_stride2_7x7_stem_padding(self, rng):
        """The ResNet stem (7x7 s2 p3) must match torch on even-sized inputs
        (this is where XLA 'SAME' padding would diverge)."""
        x = rng.standard_normal((1, 3, 480, 640)).astype(np.float32)
        tconv = torch.nn.Conv2d(3, 4, 7, stride=2, padding=3, bias=False)
        with torch.no_grad():
            ref = tconv(torch.tensor(x)).numpy()

        from dynmm_tpu.nn.layers import torch_conv

        conv = torch_conv(4, 7, stride=2, padding=3, use_bias=False)
        params = {"kernel": jnp.asarray(oihw_to_hwio(tconv.weight.detach().numpy()))}
        out = conv.apply({"params": params}, to_nhwc(x))
        assert from_nhwc(out).shape == ref.shape == (1, 4, 240, 320)
        np.testing.assert_allclose(from_nhwc(out), ref, rtol=1e-3, atol=1e-4)


class TestMaxPool:
    def test_matches_torch(self, rng):
        x = rng.standard_normal((2, 4, 9, 11)).astype(np.float32)
        ref = F.max_pool2d(torch.tensor(x), 3, stride=2, padding=1).numpy()
        out = max_pool_3x3_s2(to_nhwc(x))
        np.testing.assert_allclose(from_nhwc(out), ref, rtol=1e-6)


class TestSqueezeExcite:
    def test_matches_torch_se(self, rng):
        x = rng.standard_normal((2, 32, 6, 7)).astype(np.float32)
        fc1 = torch.nn.Conv2d(32, 2, 1)
        fc2 = torch.nn.Conv2d(2, 32, 1)
        with torch.no_grad():
            w = torch.sigmoid(fc2(F.relu(fc1(F.adaptive_avg_pool2d(torch.tensor(x), 1)))))
            ref = (torch.tensor(x) * w).numpy()

        model = SqueezeAndExcitation(channels=32)
        params = {
            "fc1": {
                "kernel": jnp.asarray(oihw_to_hwio(fc1.weight.detach().numpy())),
                "bias": jnp.asarray(fc1.bias.detach().numpy()),
            },
            "fc2": {
                "kernel": jnp.asarray(oihw_to_hwio(fc2.weight.detach().numpy())),
                "bias": jnp.asarray(fc2.bias.detach().numpy()),
            },
        }
        out = model.apply({"params": params}, to_nhwc(x))
        np.testing.assert_allclose(from_nhwc(out), ref, rtol=1e-4, atol=1e-5)

    def test_fusion_add_shapes(self):
        model = SqueezeAndExciteFusionAdd(channels=16)
        rgb = jnp.ones((2, 8, 8, 16))
        depth = jnp.ones((2, 8, 8, 16))
        variables = model.init(jax.random.PRNGKey(0), rgb, depth)
        out = model.apply(variables, rgb, depth)
        assert out.shape == (2, 8, 8, 16)


class TestResize:
    def test_bilinear_matches_torch_align_corners_false(self, rng):
        x = rng.standard_normal((1, 3, 15, 20)).astype(np.float32)
        ref = F.interpolate(
            torch.tensor(x), (30, 40), mode="bilinear", align_corners=False
        ).numpy()
        out = resize_bilinear(to_nhwc(x), (30, 40))
        np.testing.assert_allclose(from_nhwc(out), ref, rtol=1e-4, atol=1e-5)

    def test_bilinear_arbitrary_size(self, rng):
        """Validation resizes predictions to the original label size
        (train.py:453-457) — check a non-integer scale."""
        x = rng.standard_normal((1, 2, 12, 16)).astype(np.float32)
        ref = F.interpolate(
            torch.tensor(x), (25, 37), mode="bilinear", align_corners=False
        ).numpy()
        out = resize_bilinear(to_nhwc(x), (25, 37))
        np.testing.assert_allclose(from_nhwc(out), ref, rtol=1e-3, atol=1e-4)

    def test_nearest_x2_matches_torch(self, rng):
        x = rng.standard_normal((1, 2, 5, 6)).astype(np.float32)
        ref = F.interpolate(torch.tensor(x), scale_factor=2, mode="nearest").numpy()
        out = resize_nearest(to_nhwc(x), (10, 12))
        np.testing.assert_allclose(from_nhwc(out), ref, rtol=1e-6)


class TestUpsampleLearned3x3:
    def test_initial_weights_mimic_bilinear(self, rng):
        """At init (bilinear kernel, zero bias) the learned-3x3-zeropad
        upsample is nearest x2 + bilinear-kernel depthwise conv; cross-check
        against an equivalent torch computation."""
        x = rng.standard_normal((1, 4, 6, 8)).astype(np.float32)
        model = Upsample(mode="learned-3x3-zeropad", channels=4)
        variables = model.init(jax.random.PRNGKey(0), to_nhwc(x))
        out = model.apply(variables, to_nhwc(x))

        tx = F.interpolate(torch.tensor(x), scale_factor=2, mode="nearest")
        w = torch.tensor(
            [[[[0.0625, 0.125, 0.0625], [0.125, 0.25, 0.125], [0.0625, 0.125, 0.0625]]]]
        ).repeat(4, 1, 1, 1)
        ref = F.conv2d(tx, w, padding=1, groups=4).numpy()
        np.testing.assert_allclose(from_nhwc(out), ref, rtol=1e-4, atol=1e-5)

    def test_learned_3x3_replication_pad(self, rng):
        x = rng.standard_normal((1, 2, 4, 4)).astype(np.float32)
        model = Upsample(mode="learned-3x3", channels=2)
        variables = model.init(jax.random.PRNGKey(0), to_nhwc(x))
        out = model.apply(variables, to_nhwc(x))

        tx = F.interpolate(torch.tensor(x), scale_factor=2, mode="nearest")
        tx = F.pad(tx, (1, 1, 1, 1), mode="replicate")
        w = torch.tensor(
            [[[[0.0625, 0.125, 0.0625], [0.125, 0.25, 0.125], [0.0625, 0.125, 0.0625]]]]
        ).repeat(2, 1, 1, 1)
        ref = F.conv2d(tx, w, padding=0, groups=2).numpy()
        np.testing.assert_allclose(from_nhwc(out), ref, rtol=1e-4, atol=1e-5)


class TestFirstArgmax:
    """first_argmax must be a drop-in jnp.argmax (first-max tie-break) —
    it backs the eval-step / predict.py class-map extraction
    (perf_argmax_net.py: variadic reduce +16.3 ms vs this form +3.6 ms)."""

    def test_matches_argmax_random(self, rng):
        from dynmm_tpu.nn.layers import first_argmax

        x = rng.standard_normal((3, 7, 9, 40)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(first_argmax(jnp.asarray(x))),
            np.argmax(x, axis=-1),
        )

    def test_first_index_ties(self, rng):
        from dynmm_tpu.nn.layers import first_argmax

        # quantize hard so duplicated maxima are common, plus crafted rows
        x = np.round(rng.standard_normal((64, 13)) * 2) / 2
        x[0] = 0.0                           # all-tie -> index 0
        x[1] = [1, 5, 3, 5, 5, 0, 5, 1, 2, 5, 4, 5, 5]  # scattered ties
        x[2, ::3] = x[2].max() + 1           # periodic ties
        x = x.astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(first_argmax(jnp.asarray(x))),
            np.argmax(x, axis=-1),
        )

    def test_bf16_and_axis(self, rng):
        from dynmm_tpu.nn.layers import first_argmax

        x = rng.standard_normal((5, 40, 6)).astype(np.float32)
        x16 = jnp.asarray(x, dtype=jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(first_argmax(x16, axis=1)),
            np.argmax(np.asarray(x16).astype(np.float32), axis=1),
        )
        assert first_argmax(x16, axis=1).dtype == jnp.int32

    def test_fallback_large_axis(self, rng):
        from dynmm_tpu.nn.layers import first_argmax

        # 300 > bf16's 256-integer representability limit -> jnp.argmax path
        x16 = jnp.asarray(rng.standard_normal((4, 300)), dtype=jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(first_argmax(x16)),
            np.argmax(np.asarray(x16).astype(np.float32), axis=-1),
        )
        assert first_argmax(x16).dtype == jnp.int32
