"""forward_switch_batched must equal the dense hard forward exactly, for any
mix of per-sample path selections."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynmm_tpu.models.skip_gate import SkipGateESANet
from tests.test_esanet_models import SMALL, rand_inputs


@pytest.fixture(scope="module")
def model_vars():
    m = SkipGateESANet(SMALL)
    rgb, depth = rand_inputs(np.random.default_rng(0), batch=4)
    v = m.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    return m, v


def test_batched_switch_matches_dense(model_vars):
    m, v = model_vars
    rgb, depth = rand_inputs(np.random.default_rng(1), batch=4)
    dense = m.apply(v, rgb, depth, train=False, hard=True)
    routed, w = m.apply(
        v, rgb, depth, return_weight=True, method=m.forward_switch_batched
    )
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(routed), rtol=1e-4, atol=1e-4
    )
    assert w.shape == (4, 5)


def test_batched_switch_baseline(model_vars):
    m, v = model_vars
    rgb, depth = rand_inputs(np.random.default_rng(2), batch=2)
    dense = m.apply(v, rgb, depth, train=False, baseline=True)
    routed = m.apply(v, rgb, depth, baseline=True, method=m.forward_switch_batched)
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(routed), rtol=1e-4, atol=1e-4
    )


def test_batched_switch_jit(model_vars):
    m, v = model_vars
    rgb, depth = rand_inputs(np.random.default_rng(3), batch=2)
    f = jax.jit(lambda v, r, d: m.apply(v, r, d, method=m.forward_switch_batched))
    out = f(v, rgb, depth)
    assert out.shape == (2, 64, 64, 5)
