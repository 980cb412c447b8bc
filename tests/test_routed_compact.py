"""Per-sample compacted routing must match dense hard eval.

``forward_routed_compact`` permutes the batch once into descending-path
order, runs each depth stage on a static prefix whose capacity comes from a
ladder of chained 2-way conds, and unpermutes the logits at the end. For
every path pattern and every ladder the logits must match the dense hard
forward (same mixing math; non-participants reduce to exactly rgb)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynmm_tpu.models.esanet import ESANetConfig
from dynmm_tpu.models.skip_gate import SkipGateESANet

CFG = ESANetConfig(
    height=64, width=64, num_classes=5,
    encoder_rgb="resnet18", encoder_depth="resnet18",
    encoder_block="BasicBlock",
    channels_decoder=(32, 32, 32), nr_decoder_blocks=(1, 1, 1),
    fuse_depth_in_rgb_encoder="SE-add", context_module="ppm",
    upsampling="learned-3x3-zeropad",
)


class FixedGateNet(SkipGateESANet):
    """Gate override: per-sample paths supplied out-of-band for testing."""

    def gate_weights(self, rgb, depth, **kw):
        paths = self.variables.get("test_paths", None)
        assert paths is not None
        return jax.nn.one_hot(
            paths["paths"][: rgb.shape[0]], 5, dtype=rgb.dtype
        )


@pytest.fixture(scope="module")
def setup():
    model = FixedGateNet(CFG)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.standard_normal((8, 64, 64, 3)).astype(np.float32))
    depth = jnp.asarray(rng.standard_normal((8, 64, 64, 1)).astype(np.float32))
    variables = dict(
        SkipGateESANet(CFG).init(jax.random.PRNGKey(0), rgb, depth, train=False)
    )
    return model, variables, rgb, depth


@pytest.mark.parametrize(
    "paths",
    [
        [0, 0, 0, 0, 0, 0, 0, 0],
        [4, 4, 4, 4, 4, 4, 4, 4],
        [0, 4, 2, 1, 3, 0, 0, 2],
        [4, 0, 0, 0, 0, 0, 0, 0],   # one expensive sample
        [1, 1, 2, 2, 3, 3, 3, 1],
    ],
    ids=["all-cheap", "all-fuse", "mixed", "one-expensive", "no-zeros"],
)
def test_compact_matches_dense(setup, paths, ):
    model, variables, rgb, depth = setup
    v = {**variables, "test_paths": {"paths": jnp.asarray(paths, jnp.int32)}}

    dense = model.apply(v, rgb, depth, train=False, hard=True)
    compact = model.apply(v, rgb, depth, method=model.forward_routed_compact)
    np.testing.assert_allclose(
        np.asarray(compact), np.asarray(dense), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("caps", [(0, 2, 8), (0, 1, 2, 4, 8), (0, 4, 8)])
def test_compact_fine_ladders_match_dense(setup, caps):
    """Capacity ladders finer than the default (0, bs) stay exact: padding
    rows inside a prefix mix to 1*rgb regardless of capacity choice."""
    model, variables, rgb, depth = setup
    v = {**variables,
         "test_paths": {"paths": jnp.asarray([0, 4, 2, 1, 3, 0, 0, 2])}}
    dense = model.apply(v, rgb, depth, train=False, hard=True)
    compact = model.apply(v, rgb, depth, caps=caps,
                          method=model.forward_routed_compact)
    np.testing.assert_allclose(
        np.asarray(compact), np.asarray(dense), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize(
    "ladders",
    [
        # well-matched schedule for the path pattern below (n_i = 6,4,2,1)
        ((6, 8), (4, 8), (2, 8), (1, 8)),
        # mispredicted rungs must fall through to the bs rung, still exact
        ((0, 8), (8,), (0, 8), (0, 8)),
        # mixed rung counts per stage
        ((8,), (0, 4, 8), (2, 8), (0, 8)),
    ],
    ids=["matched", "mispredicted", "mixed-depth"],
)
def test_compact_per_stage_ladders_match_dense(setup, ladders):
    """Per-stage capacity schedules (caps = 4 ladders) stay exact whether
    or not the rungs match the batch's actual participant counts."""
    model, variables, rgb, depth = setup
    v = {**variables,
         "test_paths": {"paths": jnp.asarray([0, 4, 2, 1, 3, 0, 1, 2])}}
    dense = model.apply(v, rgb, depth, train=False, hard=True)
    compact = model.apply(v, rgb, depth, caps=ladders,
                          method=model.forward_routed_compact)
    np.testing.assert_allclose(
        np.asarray(compact), np.asarray(dense), atol=1e-5, rtol=1e-5
    )


def test_capacity_ladders_from_ratios():
    """Schedule derivation: always-on stages get a single no-cond rung,
    dead stages (0, bs), fractional stages a ceil rung + the bs rung."""
    from dynmm_tpu.models.skip_gate import capacity_ladders

    # the R50 1e-2 recipe gate's mix: 53% k1 / 47% k2
    lad = capacity_ladders([0.0, 0.531, 0.469, 0.0, 0.0], 8)
    assert lad == ((8,), (4, 8), (0, 8), (0, 8))
    # the flagship recipe mix: 53% k0 / 47% k2
    lad = capacity_ladders([0.531, 0.0, 0.469, 0.0, 0.0], 8)
    assert lad == ((4, 8), (4, 8), (0, 8), (0, 8))
    # all-heavy gate: every stage always on
    lad = capacity_ladders([0.0, 0.0, 0.0, 0.5, 0.5], 8)
    assert lad == ((8,), (8,), (8,), (4, 8))


def test_compact_strict_caps_exact_when_rungs_cover(setup):
    """strict_caps single-rung schedule (zero conds): when every rung
    covers the batch's actual participant count nothing is dropped and
    the result is exact."""
    model, variables, rgb, depth = setup
    # counts for this pattern: n_1..4 = 6, 4, 2, 1
    v = {**variables,
         "test_paths": {"paths": jnp.asarray([0, 4, 2, 1, 3, 0, 1, 2])}}
    dense = model.apply(v, rgb, depth, train=False, hard=True)
    strict = model.apply(v, rgb, depth, caps=((6,), (4,), (2,), (1,)),
                         strict_caps=True,
                         method=model.forward_routed_compact)
    np.testing.assert_allclose(
        np.asarray(strict), np.asarray(dense), atol=1e-5, rtol=1e-5
    )


def test_compact_strict_caps_overflow_degrades(setup):
    """Overflow beyond a strict rung degrades gracefully: dropped rows
    lose that stage's depth contribution only; rows on path 0 (never
    participants) are untouched and must still match dense exactly."""
    model, variables, rgb, depth = setup
    paths = [0, 4, 2, 1, 3, 0, 1, 2]
    v = {**variables, "test_paths": {"paths": jnp.asarray(paths)}}
    dense = np.asarray(model.apply(v, rgb, depth, train=False, hard=True))
    strict = np.asarray(model.apply(
        v, rgb, depth, caps=((6,), (4,), (1,), (0,)), strict_caps=True,
        method=model.forward_routed_compact))
    assert np.all(np.isfinite(strict))
    zero_rows = [i for i, p in enumerate(paths) if p == 0]
    np.testing.assert_allclose(
        strict[zero_rows], dense[zero_rows], atol=1e-5, rtol=1e-5
    )
    # the k=4 sample lost its stage-4 (and one of stage-3's) contribution
    assert not np.allclose(strict, dense, atol=1e-5)


def test_capacity_ladders_strict_factor():
    """capacity_factor gives MoE-style strict rungs: ceil(bs*P*f), clipped
    to bs, non-increasing across stages, 0 only for dead stages."""
    from dynmm_tpu.models.skip_gate import capacity_ladders

    lad = capacity_ladders([0.0, 0.531, 0.469, 0.0, 0.0], 8,
                           capacity_factor=1.25)
    assert lad == ((8,), (5,), (0,), (0,))
    # a tiny live tail keeps a rung >= 1
    lad = capacity_ladders([0.9, 0.0, 0.0, 0.0, 0.1], 8,
                           capacity_factor=1.0)
    assert lad == ((1,), (1,), (1,), (1,))


def test_compact_matches_batched_switch(setup):
    model, variables, rgb, depth = setup
    v = {
        **variables,
        "test_paths": {"paths": jnp.asarray([2, 0, 1, 2, 0, 0, 1, 2])},
    }
    batched = model.apply(v, rgb, depth, method=model.forward_switch_batched)
    compact = model.apply(v, rgb, depth, method=model.forward_routed_compact)
    np.testing.assert_allclose(
        np.asarray(compact), np.asarray(batched), atol=1e-5, rtol=1e-5
    )


@pytest.mark.slow
def test_compact_odd_batch(setup):
    """Non-power-of-2 batch sizes get a bs-sized terminal capacity."""
    model, variables, _, _ = setup
    rng = np.random.default_rng(3)
    rgb = jnp.asarray(rng.standard_normal((5, 64, 64, 3)).astype(np.float32))
    depth = jnp.asarray(rng.standard_normal((5, 64, 64, 1)).astype(np.float32))
    v = {**variables, "test_paths": {"paths": jnp.asarray([4, 3, 0, 1, 4])}}
    dense = model.apply(v, rgb, depth, train=False, hard=True)
    compact = model.apply(v, rgb, depth, method=model.forward_routed_compact)
    np.testing.assert_allclose(
        np.asarray(compact), np.asarray(dense), atol=1e-5, rtol=1e-5
    )


def test_compact_live_gate(setup):
    """With the real (random-init) gate the compact path must agree with the
    dense hard forward and report identical weights."""
    _, variables, rgb, depth = setup
    model = SkipGateESANet(CFG)
    dense, w_dense = model.apply(
        variables, rgb, depth, train=False, hard=True, return_weight=True
    )
    compact, w_compact = model.apply(
        variables, rgb, depth, method=model.forward_routed_compact,
        return_weight=True,
    )
    np.testing.assert_array_equal(np.asarray(w_dense), np.asarray(w_compact))
    np.testing.assert_allclose(
        np.asarray(compact), np.asarray(dense), atol=1e-5, rtol=1e-5
    )


@pytest.mark.slow
def test_compact_bf16_selection_identical(setup):
    """bf16 serving (VERDICT r2 item 6): routed-compact and switch paths in
    bf16 activations keep hard-gate selections identical to the fp32 dense
    forward, and logits stay within bf16 drift."""
    _, variables, rgb, depth = setup
    import dataclasses

    cfg16 = dataclasses.replace(CFG, dtype=jnp.bfloat16)
    model32 = SkipGateESANet(CFG)
    model16 = SkipGateESANet(cfg16)

    dense32, w32 = model32.apply(
        variables, rgb, depth, train=False, hard=True, return_weight=True
    )
    routed16, w16 = model16.apply(
        variables, rgb, depth, method=model16.forward_routed_compact,
        return_weight=True,
    )
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(w32, -1)), np.asarray(jnp.argmax(w16, -1))
    )
    scale = float(jnp.abs(dense32).max())
    drift = float(jnp.abs(routed16.astype(jnp.float32) - dense32).max())
    assert drift / scale < 5e-2, f"bf16 routed drift {drift/scale:.3f}"

    # batch=1 switch path compiles and selects identically in bf16
    out1 = model16.apply(
        variables, rgb[:1], depth[:1], method=model16.forward_switch
    )
    assert out1.shape[0] == 1


def test_scatter_rows_exact():
    """scatter_rows places sorted-prefix rows at original positions and
    zeros elsewhere (the primitive behind the scatter-based compaction)."""
    from dynmm_tpu.core.routing import scatter_rows

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((5, 3, 4)).astype(np.float32))
    order = jnp.asarray([3, 0, 4, 1, 2])
    for cap in (0, 2, 5):
        out = np.asarray(scatter_rows(x[:cap], order, 5))
        expect = np.zeros((5, 3, 4), np.float32)
        for p in range(cap):
            expect[int(order[p])] = np.asarray(x[p])
        np.testing.assert_allclose(out, expect, atol=0, rtol=0)


def test_gate_computes_fp32_in_bf16_model(setup):
    """GlobalGate ignores the model dtype: its weights come back fp32 and
    selections match the fp32 model exactly (docstring in skip_gate.py)."""
    _, variables, rgb, depth = setup
    import dataclasses

    cfg16 = dataclasses.replace(CFG, dtype=jnp.bfloat16)
    model16 = SkipGateESANet(cfg16)
    model32 = SkipGateESANet(CFG)
    _, w16 = model16.apply(
        variables, rgb, depth, train=False, hard=True, return_weight=True
    )
    _, w32 = model32.apply(
        variables, rgb, depth, train=False, hard=True, return_weight=True
    )
    assert w16.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(w16), np.asarray(w32))


def test_gate_follows_float64_params():
    """Regression for the x64 torch-parity harness (test_torch_train_parity
    casts the whole param tree to f64): the gate must compute in the WIDER
    of fp32 and its param dtype, not hard-cast inputs to f32 (which fed an
    f32 input / f64 kernel pair into the split first conv)."""
    from jax import enable_x64

    from dynmm_tpu.models.skip_gate import GlobalGate

    g = GlobalGate()
    rgb = jnp.ones((2, 16, 16, 8), jnp.float32)
    depth = jnp.ones((2, 16, 16, 8), jnp.float32)
    v = g.init(jax.random.PRNGKey(0), rgb, depth)
    with enable_x64():
        v64 = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), v
        )
        w64 = g.apply(v64, rgb.astype(jnp.float64),
                      depth.astype(jnp.float64))
        assert w64.dtype == jnp.float64
        grads = jax.grad(
            lambda p: g.apply(p, rgb.astype(jnp.float64),
                              depth.astype(jnp.float64)).sum()
        )(v64)
        assert all(
            leaf.dtype == jnp.float64 for leaf in jax.tree.leaves(grads)
        )
