"""The optional space-to-depth stem lowering must stay mathematically
identical to the plain 7×7/2 conv (the production default since
tools/perf_stemconv.py showed XLA's native path is 30× faster at bs=8).
Same params, same outputs — the config flag is purely an execution detail."""

import jax
import jax.numpy as jnp
import numpy as np

from dynmm_tpu.models.resnet import make_resnet


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
