"""Context-module tests: adaptive pooling torch parity (PPM/APPM depend on
its exact window semantics) and pyramid module shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dynmm_tpu.models.context import (
    AdaptivePyramidPoolingModule,
    PyramidPoolingModule,
    adaptive_avg_pool2d,
    get_context_module,
)


class TestAdaptivePool:
    @pytest.mark.parametrize("hw,out", [((15, 20), (1, 1)), ((15, 20), (5, 5)),
                                        ((15, 20), (4, 7)), ((9, 11), (2, 3))])
    def test_matches_torch(self, rng, hw, out):
        x = rng.standard_normal((2, *hw, 6)).astype(np.float32)
        ours = adaptive_avg_pool2d(jnp.asarray(x), out)
        ref = F.adaptive_avg_pool2d(
            torch.tensor(np.transpose(x, (0, 3, 1, 2))), out
        ).numpy()
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, rtol=1e-5, atol=1e-6
        )


class TestPyramidModules:
    def test_ppm_shapes(self):
        m = PyramidPoolingModule(out_dim=32, bins=(1, 5))
        x = jnp.ones((2, 15, 20, 64))
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (2, 15, 20, 32)

    def test_appm_scales_bins_with_input(self):
        m = AdaptivePyramidPoolingModule(out_dim=16, input_size=(8, 8), bins=(1, 2))
        x = jnp.ones((1, 16, 16, 32))  # 2x nominal -> bins scale 2x
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (1, 16, 16, 16)

    def test_selector(self):
        mod, ch = get_context_module("ppm", 512, 128, (15, 20))
        assert mod is not None and ch == 128
        mod, ch = get_context_module("ppm-1-2-4-8", 512, 128, (16, 16))
        assert tuple(mod.bins) == (1, 2, 4, 8)
        mod, ch = get_context_module("None", 512, 128, (15, 20))
        assert mod is None and ch == 512
