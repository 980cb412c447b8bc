"""The optional space-to-depth stem lowering must stay mathematically
identical to the plain 7×7/2 conv (the production default since
tools/perf_stemconv.py showed XLA's native path is 30× faster at bs=8).
Same params, same outputs — the config flag is purely an execution detail."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest

from dynmm_tpu.models.resnet import make_resnet, space_to_depth_host


def _stems(s2d: bool, x):
    enc = make_resnet(
        "resnet34", block="NonBottleneck1D", input_channels=3,
        s2d_stem=s2d,
    )
    variables = enc.init(jax.random.PRNGKey(0), x, method=enc.stem)
    out = enc.apply(variables, x, method=enc.stem)
    return variables, np.asarray(out)


class TestStemLowering:
    def test_s2d_matches_plain(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 64, 96, 3)).astype(np.float32))
        v_plain, out_plain = _stems(False, x)
        enc = make_resnet(
            "resnet34", block="NonBottleneck1D", input_channels=3,
            s2d_stem=True,
        )
        out_s2d = np.asarray(enc.apply(v_plain, x, method=enc.stem))
        assert out_plain.shape == out_s2d.shape == (2, 32, 48, 64)
        np.testing.assert_allclose(out_s2d, out_plain, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("in_ch", [3, 1])
    def test_host_packed_matches_raw(self, in_ch):
        """A pre-packed (N, H/2, W/2, 4C) input (space_to_depth_host, the
        serving fast path that keeps the 2×2 shuffle off the device) must
        produce the stem output of the raw (N, H, W, C) input exactly."""
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 64, 96, in_ch)).astype(np.float32)
        enc = make_resnet(
            "resnet34", block="NonBottleneck1D", input_channels=in_ch,
        )
        v = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), method=enc.stem)
        raw = np.asarray(enc.apply(v, jnp.asarray(x), method=enc.stem))
        packed = np.asarray(
            enc.apply(v, jnp.asarray(space_to_depth_host(x)), method=enc.stem)
        )
        assert raw.shape == packed.shape == (2, 32, 48, 64)
        np.testing.assert_allclose(packed, raw, rtol=1e-4, atol=1e-5)

    def test_bad_channel_count_raises(self):
        enc = make_resnet(
            "resnet34", block="NonBottleneck1D", input_channels=3,
        )
        x = jnp.zeros((1, 64, 96, 3), jnp.float32)
        v = enc.init(jax.random.PRNGKey(0), x, method=enc.stem)
        with pytest.raises(ValueError, match="space-to-depth packed"):
            enc.apply(v, jnp.zeros((1, 64, 96, 2), jnp.float32),
                      method=enc.stem)


@pytest.mark.slow
class TestPackedFullModel:
    def test_skipgate_forward_packed_matches_raw(self):
        """Whole-model check: SkipGateESANet fed space_to_depth_host-packed
        rgb/depth must reproduce the raw-input forward (dense and switch)."""
        from dynmm_tpu.models.skip_gate import SkipGateESANet
        from tests.test_esanet_models import SMALL, rand_inputs

        m = SkipGateESANet(SMALL)
        rgb, depth = rand_inputs(np.random.default_rng(5), batch=2)
        v = m.init(jax.random.PRNGKey(0), rgb, depth, train=False)
        rgb_p = jnp.asarray(space_to_depth_host(np.asarray(rgb)))
        depth_p = jnp.asarray(space_to_depth_host(np.asarray(depth)))

        raw = m.apply(v, rgb, depth, train=False, baseline=True)
        packed = m.apply(v, rgb_p, depth_p, train=False, baseline=True)
        np.testing.assert_allclose(
            np.asarray(packed), np.asarray(raw), rtol=1e-4, atol=1e-4
        )

        raw_s = m.apply(v, rgb[:1], depth[:1], method=m.forward_switch)
        packed_s = m.apply(v, rgb_p[:1], depth_p[:1], method=m.forward_switch)
        np.testing.assert_allclose(
            np.asarray(packed_s), np.asarray(raw_s), rtol=1e-4, atol=1e-4
        )
