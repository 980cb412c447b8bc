"""Tests for the Pallas kernels (interpret mode on CPU; compiled-path parity
is exercised on real TPU by bench.py diagnostics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynmm_tpu.kernels.se import fits_vmem, fused_se, se_reference
from dynmm_tpu.nn.layers import SqueezeAndExcitation


class TestFusedSE:
    def test_matches_reference_math(self, rng):
        hw, c, cr = 128, 64, 4
        x = jnp.asarray(rng.standard_normal((hw, c)).astype(np.float32))
        w1 = jnp.asarray(rng.standard_normal((c, cr)).astype(np.float32))
        b1 = jnp.asarray(rng.standard_normal(cr).astype(np.float32))
        w2 = jnp.asarray(rng.standard_normal((cr, c)).astype(np.float32))
        b2 = jnp.asarray(rng.standard_normal(c).astype(np.float32))
        out = fused_se(x, w1, b1, w2, b2, interpret=True)
        ref = se_reference(x, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_batched_via_vmap(self, rng):
        x = jnp.asarray(rng.standard_normal((3, 64, 32)).astype(np.float32))
        w1 = jnp.asarray(rng.standard_normal((32, 2)).astype(np.float32))
        b1 = jnp.zeros(2)
        w2 = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))
        b2 = jnp.zeros(32)
        out = fused_se(x, w1, b1, w2, b2, interpret=True)
        ref = se_reference(x, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_fits_vmem_gate(self):
        assert fits_vmem((60 * 80, 128))        # stage-2 SE input
        # stage-1 and stem maps exceed the double-buffered VMEM budget
        assert not fits_vmem((120 * 160, 64))
        assert not fits_vmem((240 * 320, 64))

    def test_module_math_path_equals_conv_formulation(self, rng):
        """The SE module's matmul formulation must equal the literal 1×1-conv
        formulation (what the checkpoint was trained with)."""
        x = rng.standard_normal((2, 8, 9, 32)).astype(np.float32)
        m = SqueezeAndExcitation(channels=32)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out = m.apply(v, jnp.asarray(x))

        k1 = np.asarray(v["params"]["fc1"]["kernel"])[0, 0]
        bb1 = np.asarray(v["params"]["fc1"]["bias"])
        k2 = np.asarray(v["params"]["fc2"]["kernel"])[0, 0]
        bb2 = np.asarray(v["params"]["fc2"]["bias"])
        pooled = x.mean(axis=(1, 2))
        s = 1 / (1 + np.exp(-(np.maximum(pooled @ k1 + bb1, 0) @ k2 + bb2)))
        ref = x * s[:, None, None, :]
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


class TestFusedNBt1D:
    def _params(self, rng, c):
        f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
        return [f(3, c, c), f(c), f(3, c, c), f(c), f(c) + 1.0, f(c),
                f(3, c, c), f(c), f(3, c, c), f(c), f(c) + 1.0, f(c)]

    @pytest.mark.parametrize("h,w,c", [(12, 10, 8), (30, 40, 16), (8, 6, 4)])
    def test_matches_reference(self, rng, h, w, c):
        from dynmm_tpu.kernels.nbt1d import fused_nbt1d, reference_nbt1d

        x = jnp.asarray(rng.standard_normal((2, h, w, c)).astype(np.float32))
        params = self._params(rng, c)
        out = fused_nbt1d(x, *params, interpret=True)
        ref = reference_nbt1d(x, *params)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
        )

    def test_reference_matches_flax_module(self, rng):
        """The kernel's parameterization (folded BN) must equal the actual
        NonBottleneck1D module in eval mode."""
        from dynmm_tpu.kernels.nbt1d import fold_bn, reference_nbt1d
        from dynmm_tpu.models.resnet import NonBottleneck1D

        c = 8
        x = jnp.asarray(rng.standard_normal((1, 6, 6, c)).astype(np.float32))
        m = NonBottleneck1D(c)
        v = m.init(jax.random.PRNGKey(1), x)
        out_mod = m.apply(v, x)

        p, bs = v["params"], v["batch_stats"]
        s1, t1 = fold_bn(p["bn1"]["scale"], p["bn1"]["bias"],
                         bs["bn1"]["mean"], bs["bn1"]["var"])
        s2, t2 = fold_bn(p["bn2"]["scale"], p["bn2"]["bias"],
                         bs["bn2"]["mean"], bs["bn2"]["var"])
        out_ref = reference_nbt1d(
            x,
            p["conv3x1_1"]["kernel"][:, 0], p["conv3x1_1"]["bias"],
            p["conv1x3_1"]["kernel"][0], p["conv1x3_1"]["bias"], s1, t1,
            p["conv3x1_2"]["kernel"][:, 0], p["conv3x1_2"]["bias"],
            p["conv1x3_2"]["kernel"][0], p["conv1x3_2"]["bias"], s2, t2,
        )
        np.testing.assert_allclose(
            np.asarray(out_mod), np.asarray(out_ref), rtol=1e-4, atol=1e-5
        )

class TestFusedNBt1DTwoPass:
    @pytest.mark.parametrize("h,w,c", [(12, 10, 8), (30, 40, 16)])
    def test_matches_reference(self, rng, h, w, c):
        from dynmm_tpu.kernels.nbt1d import fused_nbt1d_twopass, reference_nbt1d

        f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
        params = [f(3, c, c), f(c), f(3, c, c), f(c), f(c) + 1.0, f(c),
                  f(3, c, c), f(c), f(3, c, c), f(c), f(c) + 1.0, f(c)]
        x = jnp.asarray(rng.standard_normal((2, h, w, c)).astype(np.float32))
        out = fused_nbt1d_twopass(x, *params, interpret=True)
        ref = reference_nbt1d(x, *params)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
        )
