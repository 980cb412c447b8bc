"""The mix-folded fusion (SqueezeAndExciteFusionAdd.fuse_mixed) must equal
the unfused form w·rgb + (1−w)·(se(rgb)+se(depth)) — the algebraic identity
every DynMM forward now relies on."""

import jax
import jax.numpy as jnp
import numpy as np

from dynmm_tpu.nn.layers import SqueezeAndExciteFusionAdd


class TestFuseMixed:
    def test_matches_unfused(self):
        rng = np.random.default_rng(0)
        rgb = jnp.asarray(rng.standard_normal((4, 8, 6, 32)).astype(np.float32))
        depth = jnp.asarray(
            rng.standard_normal((4, 8, 6, 32)).astype(np.float32))
        w = jnp.asarray(np.array([0.0, 1.0, 0.3, 0.8], np.float32))
        mod = SqueezeAndExciteFusionAdd(32)
        variables = mod.init(jax.random.PRNGKey(0), rgb, depth)

        fused = mod.apply(variables, rgb, depth)
        ref = (w[:, None, None, None] * rgb
               + (1.0 - w[:, None, None, None]) * fused)
        got = mod.apply(variables, rgb, depth, w, method=mod.fuse_mixed)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_hard_endpoints(self):
        """w=1 must return rgb exactly; w=0 the plain fusion."""
        rng = np.random.default_rng(1)
        rgb = jnp.asarray(rng.standard_normal((2, 4, 4, 16)).astype(np.float32))
        depth = jnp.asarray(
            rng.standard_normal((2, 4, 4, 16)).astype(np.float32))
        mod = SqueezeAndExciteFusionAdd(16)
        variables = mod.init(jax.random.PRNGKey(0), rgb, depth)
        ones = jnp.ones((2,), jnp.float32)
        got1 = mod.apply(variables, rgb, depth, ones, method=mod.fuse_mixed)
        np.testing.assert_allclose(np.asarray(got1), np.asarray(rgb),
                                   rtol=1e-6, atol=1e-7)
        got0 = mod.apply(variables, rgb, depth, ones * 0.0,
                         method=mod.fuse_mixed)
        ref0 = mod.apply(variables, rgb, depth)
        np.testing.assert_allclose(np.asarray(got0), np.asarray(ref0),
                                   rtol=1e-6, atol=1e-6)
