"""Capacity-factor serving knob (eval.py/predict.py --capacity_factor).

``SegTrainConfig.serve_capacity_factor > 0`` routes validation through
``forward_routed_compact`` with the STRICT single-rung capacity schedule
(``capacity_ladders(ratios, bs, capacity_factor=f)`` — MoE drop semantics,
zero lax.cond boundaries). A generous factor covers every batch's actual
participant counts, so the scored mIoU must equal the exact dense hard eval
chain; the gate-only ratio-estimation program must agree with the full
forward's reported weights.

Reference context: the reference evaluates through its dense hard forward
only (FusionDynMM/eval.py:107-141); the capacity schedule is the TPU-native
serving extension whose accuracy knob this file pins down.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynmm_tpu.core.resource import GateStats
from dynmm_tpu.data.nyuv2 import SyntheticSegDataset
from dynmm_tpu.data.seg_preprocessing import SegLoader, SegPreprocessor
from dynmm_tpu.models.esanet import ESANetConfig
from dynmm_tpu.models.skip_gate import SkipGateESANet, capacity_ladders
from dynmm_tpu.train.seg import SegTrainConfig, SegTrainer

H = W = 64
SMALL = ESANetConfig(
    height=H, width=W, num_classes=5,
    encoder_rgb="resnet18", encoder_depth="resnet18",
    encoder_block="BasicBlock",
    channels_decoder=(32, 32, 32), nr_decoder_blocks=(1, 1, 1),
    fuse_depth_in_rgb_encoder="SE-add", upsampling="bilinear",
    context_module="None",
)


@pytest.fixture(scope="module")
def setup():
    ds = SyntheticSegDataset(n=4, height=H, width=W, n_classes=5,
                             split="test", seed=7, mixed_modality_frac=0.5)
    pre = SegPreprocessor(2000.0, 800.0, H, W, phase="test")
    loader = SegLoader(ds, pre, batch_size=2)
    model = SkipGateESANet(SMALL)
    cfg = SegTrainConfig(dynamic=True, global_gate=True, soft_eval=False)
    trainer = SegTrainer(model, cfg, np.ones(5, np.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), next(iter(loader)))
    return model, cfg, trainer, state, loader


def _estimate_ratios(model, state, loader):
    gate_fn = jax.jit(
        lambda v, r, d: model.apply(v, r, d, method=model.gate_only))
    variables = {"params": state["params"], **state["model_state"]}
    stats = GateStats()
    for b in loader:
        stats.append(gate_fn(variables, jnp.asarray(b["image"]),
                             jnp.asarray(b["depth"])))
    return stats.branch_ratios()


def test_gate_only_matches_full_forward_weights(setup):
    """The cheap ratio-estimation program (stems + gate, nothing else)
    reports exactly the weights the full dense hard forward reports."""
    model, _, _, state, loader = setup
    variables = {"params": state["params"], **state["model_state"]}
    batch = next(iter(loader))
    rgb = jnp.asarray(batch["image"])
    depth = jnp.asarray(batch["depth"])
    w_gate = model.apply(variables, rgb, depth, method=model.gate_only)
    _, w_full = model.apply(variables, rgb, depth, train=False, hard=True,
                            return_weight=True)
    np.testing.assert_array_equal(np.asarray(w_gate), np.asarray(w_full))


def test_capacity_factor_generous_matches_exact_eval(setup):
    """With a factor generous enough that no rung overflows, the strict
    serving chain scores the identical mIoU (and confusion matrices) as
    the exact reference-parity eval chain."""
    import dataclasses

    model, cfg, trainer, state, loader = setup
    miou_exact, _ = trainer.validate(state, loader)

    ratios = _estimate_ratios(model, state, loader)
    cfg_s = dataclasses.replace(cfg, serve_capacity_factor=8.0)
    trainer_s = SegTrainer(model, cfg_s, np.ones(5, np.float32))
    trainer_s.serve_ratios = ratios
    cms_exact: dict = {}
    cms_strict: dict = {}
    trainer.validate(state, loader, out_cms=cms_exact)
    miou_strict, _ = trainer_s.validate(state, loader, out_cms=cms_strict)
    assert miou_strict == miou_exact
    for cam in cms_exact:
        np.testing.assert_array_equal(cms_exact[cam], cms_strict[cam])


def test_capacity_factor_tight_still_scores(setup):
    """A deliberately tight factor (drops likely) must still produce a
    finite mIoU in [0, 1] — graceful degradation, never an error."""
    import dataclasses

    model, cfg, trainer, state, loader = setup
    ratios = _estimate_ratios(model, state, loader)
    cfg_s = dataclasses.replace(cfg, serve_capacity_factor=0.25)
    trainer_s = SegTrainer(model, cfg_s, np.ones(5, np.float32))
    trainer_s.serve_ratios = ratios
    miou, _ = trainer_s.validate(state, loader)
    v = next(iter(miou.values()))
    assert 0.0 <= v <= 1.0


def test_capacity_factor_requires_hard_nonbaseline(setup):
    """Soft eval under the strict schedule is a config error (the schedule
    serves the hard-gate chain), as is a missing ratio estimate."""
    import dataclasses

    model, cfg, _, state, loader = setup
    cfg_soft = dataclasses.replace(cfg, serve_capacity_factor=1.25,
                                   soft_eval=True)
    t = SegTrainer(model, cfg_soft, np.ones(5, np.float32))
    t.serve_ratios = np.asarray([0.5, 0, 0.5, 0, 0])
    with pytest.raises(ValueError, match="hard"):
        t.validate(state, loader)

    cfg_ok = dataclasses.replace(cfg, serve_capacity_factor=1.25)
    t2 = SegTrainer(model, cfg_ok, np.ones(5, np.float32))
    with pytest.raises(ValueError, match="serve_ratios"):
        t2.validate(state, loader)


def test_strict_schedule_shrinks_with_batch():
    """Trace-time batch shape drives the schedule: a tail batch smaller
    than the serving batch size derives its own valid rungs (<= bs)."""
    r = [0.5, 0.0, 0.5, 0.0, 0.0]
    full = capacity_ladders(r, 8, capacity_factor=1.25)
    tail = capacity_ladders(r, 3, capacity_factor=1.25)
    assert all(lad[-1] <= 8 for lad in full)
    assert all(lad[-1] <= 3 for lad in tail)
