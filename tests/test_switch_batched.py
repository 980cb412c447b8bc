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


def test_forward_switch_rejects_batch_gt1(model_vars):
    # VERDICT r2 item 8: forward_switch takes its routing decision from
    # sample 0; silently applying it to a whole batch would be wrong math.
    m, v = model_vars
    rgb, depth = rand_inputs(np.random.default_rng(4), batch=2)
    with pytest.raises(ValueError, match="sample 0"):
        m.apply(v, rgb, depth, method=m.forward_switch)
    # batch=1 and force_path stay valid
    out1 = m.apply(v, rgb[:1], depth[:1], method=m.forward_switch)
    assert out1.shape[0] == 1
    outf = m.apply(v, rgb, depth, force_path=4, method=m.forward_switch)
    assert outf.shape[0] == 2
