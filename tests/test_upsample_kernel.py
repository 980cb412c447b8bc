"""Fused learned-3x3 upsample kernel: exactness vs the unfused reference
(interpret mode; compiled-path status in the module docstring)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dynmm_tpu.kernels.upsample import (
    _pick_tile,
    fused_learned_upsample,
    reference_learned_upsample,
)


@pytest.mark.parametrize("h,w,c", [(15, 20, 8), (30, 40, 16), (12, 10, 4)])
def test_fused_matches_reference(rng, h, w, c):
    x = jnp.asarray(rng.standard_normal((h, w, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, c)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    out = fused_learned_upsample(x, k, b, interpret=True)
    ref = reference_learned_upsample(x, k, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_batched(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 6, 4)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 4)).astype(np.float32))
    b = jnp.zeros(4)
    out = fused_learned_upsample(x, k, b, interpret=True)
    ref = reference_learned_upsample(x, k, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_bilinear_init_equals_module_semantics(rng):
    """With the bilinear kernel + zero bias, the fused op reproduces the
    Upsample('learned-3x3-zeropad') init behavior."""
    from dynmm_tpu.nn.layers import _bilinear_3x3_kernel

    x = jnp.asarray(rng.standard_normal((6, 8, 4)).astype(np.float32))
    k = _bilinear_3x3_kernel(4)[:, :, 0, :]
    b = jnp.zeros(4)
    out = fused_learned_upsample(x, k, b, interpret=True)
    ref = reference_learned_upsample(x, k, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_pick_tile_divides():
    for out_h in (30, 60, 120, 240, 480, 962):
        t = _pick_tile(out_h)
        assert out_h % t == 0 and t % 2 == 0
