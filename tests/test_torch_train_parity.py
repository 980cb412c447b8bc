"""TRAIN-STEP parity against the reference's own torch training math.

The forward-parity oracle (tests/test_torch_oracle.py) proves logits and
gate selections; this suite proves the *training* side — the strongest
remaining acceptance evidence while real NYUv2 checkpoints are unavailable
(VERDICT r2 item 1):

* per-leaf GRADIENTS of the full training loss match torch autograd,
  including the straight-through hard-gate path
  (``model_skip_mod_globalgate.py:20-30`` — the likeliest silent-divergence
  point),
* BatchNorm RUNNING-STAT updates match torch's semantics (unbiased batch
  variance for the running update — ``TorchBatchNorm`` in nn/layers.py),
* OPTIMIZER steps match: SGD(momentum 0.9, nesterov, wd) for the seg stack
  (``FusionDynMM/train.py:306-324``, :558-564) and
  AdamW + global-norm clip 8 + ``loss1 + λ·loss2`` for the IMDB router
  (``ModalityDynMM/training_structures/Supervised_Learning.py:136-144``).

Seg tests drive the reference's OWN code (model + CrossEntropyLoss2d from
``src/utils.py:18-50``) with weights exported from our flax model. The IMDB
oracle is a weight-copied torch replica built in-test (MultiBench, the
reference's dependency, is external and not vendored — SURVEY §2.3); the
replica reproduces the exact module contracts our flax modules implement.
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from dynmm_tpu.models.esanet import ESANetConfig
from dynmm_tpu.models.skip_gate import SkipGateESANet
from dynmm_tpu.train.seg import SegTrainConfig, make_seg_optimizer
from dynmm_tpu.train.seg_losses import multiscale_ce
from dynmm_tpu.utils.torch_export import export_state_dict

pytestmark = pytest.mark.slow  # full CLI/parity/mesh drive; -m "not slow" skips

REF_ROOT = "/root/reference/FusionDynMM"

N_CLASSES = 7
H, W = 96, 128
BS = 3
LOSS_RATIO = 0.1
FLOP_BUDGET = 1.0
LR = 0.01
WD = 1e-4


@pytest.fixture(scope="module")
def ref_modules():
    """Reference model + loss modules with .cuda() neutralized."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    orig_tensor_cuda = torch.Tensor.cuda
    orig_module_cuda = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    try:
        from src import utils as ref_utils
        from src.models import model_skip_mod_globalgate as ref_gate

        yield ref_gate, ref_utils
    finally:
        torch.Tensor.cuda = orig_tensor_cuda
        torch.nn.Module.cuda = orig_module_cuda


def _seg_cfg():
    return ESANetConfig(
        height=H, width=W, num_classes=N_CLASSES,
        encoder_rgb="resnet18", encoder_depth="resnet18",
        encoder_block="NonBottleneck1D",
        channels_decoder=(64, 32, 16), nr_decoder_blocks=(1, 1, 1),
        fuse_depth_in_rgb_encoder="SE-add", context_module="ppm",
        upsampling="learned-3x3-zeropad",
    )


def _build_ref_net(ref_gate, variables, hard: bool, double: bool = False):
    net = ref_gate.SkipGateESANet(
        height=H, width=W, num_classes=N_CLASSES,
        encoder_rgb="resnet18", encoder_depth="resnet18",
        encoder_block="NonBottleneck1D",
        channels_decoder=[64, 32, 16], nr_decoder_blocks=[1, 1, 1],
        pretrained_on_imagenet=False,
        fuse_depth_in_rgb_encoder="SE-add", context_module="ppm",
        upsampling="learned-3x3-zeropad",
    )
    if double:
        net = net.double()
    sd = export_state_dict(variables["params"], variables["batch_stats"])
    tensors = {k: torch.tensor(np.ascontiguousarray(v)) for k, v in sd.items()}
    missing, unexpected = net.load_state_dict(tensors, strict=False)
    assert not unexpected
    assert all(m.endswith("num_batches_tracked") for m in missing)
    net.train()
    net.temp = 1.0
    net.hard_gate = hard
    net.baseline = False
    net.ini_stage = False
    net.save_weight_info = False
    return net


def _seg_batch(seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    rgb = rng.standard_normal((BS, H, W, 3)).astype(dtype)
    depth = rng.standard_normal((BS, H, W, 1)).astype(dtype)
    labels = [
        rng.integers(0, N_CLASSES + 1, (BS, H // r, W // r)).astype(np.int32)
        for r in (1, 8, 16, 32)
    ]
    weights = (0.5 + rng.random(N_CLASSES)).astype(dtype)
    return rgb, depth, labels, weights


def _to_f64(tree):
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float64), tree
    )


def _flax_seg_loss_fn(model, class_weights, targets, rgb, depth, hard):
    cw = jnp.asarray(class_weights)
    tg = [jnp.asarray(t) for t in targets]

    def loss_fn(params, batch_stats):
        (preds, loss_flop), new_state = model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(rgb), jnp.asarray(depth),
            train=True, temp=1.0, hard=hard, mutable=["batch_stats"],
        )
        loss_seg, _ = multiscale_ce(preds, tg, cw)
        total = loss_seg + LOSS_RATIO * jnp.maximum(
            loss_flop - FLOP_BUDGET, 0.0
        )
        return total, new_state["batch_stats"]

    return loss_fn


def _ref_seg_total(ref_net, ref_utils, rgb, depth, labels, class_weights):
    t_rgb = torch.tensor(rgb.transpose(0, 3, 1, 2))
    t_depth = torch.tensor(depth.transpose(0, 3, 1, 2))
    targets = [torch.tensor(t) for t in labels]
    loss_fn = ref_utils.CrossEntropyLoss2d("cpu", class_weights)
    if rgb.dtype == np.float64:
        # the reference hardcodes .float() on the CE weight (utils.py:28)
        loss_fn.ce_loss = loss_fn.ce_loss.double()
    pred_scales, loss_flop = ref_net(t_rgb, t_depth)
    losses = loss_fn(pred_scales, targets)
    loss_seg = sum(losses)
    hinge = torch.max(torch.zeros_like(loss_flop), loss_flop - FLOP_BUDGET)
    return loss_seg + LOSS_RATIO * hinge


def _compare_trees(flax_tree, torch_named, batch_stats=None, tol=2e-3,
                   what="grad", floor=1e-5):
    """Per-leaf closeness, torch-keyed. ``flax_tree`` is a params-shaped tree
    (grads or params); ``torch_named`` is {torch_key: tensor}.

    Per-tensor scale is floored at 1e-5 of the global max: biases feeding a
    BatchNorm have analytically-zero grads (BN subtracts the mean), so both
    sides hold only fp noise there (measured ≤1.3e-5 against a 9.35 global
    grad max) and a pure relative test would divide noise by noise."""
    ours = export_state_dict(flax_tree, batch_stats)
    named = {k: np.asarray(v.detach()) for k, v in torch_named.items()
             if not k.endswith("num_batches_tracked")}
    global_max = max((np.abs(v).max() for v in named.values()), default=1.0)
    checked = 0
    worst = (0.0, None)
    for key, ref in named.items():
        assert key in ours, f"missing {what} for {key}"
        got = np.asarray(ours[key], np.float64)
        scale = max(np.abs(ref).max(), floor * global_max, 1e-12)
        err = np.abs(got - ref).max() / scale
        if err > worst[0]:
            worst = (err, key)
        checked += 1
    assert checked > 50
    assert worst[0] < tol, (
        f"{what} mismatch: {worst[1]} rel-err {worst[0]:.2e} (tol {tol})"
    )


@pytest.mark.parametrize("hard", [False, True], ids=["soft", "hard-ST"])
def test_seg_gradient_and_bn_parity(ref_modules, hard):
    """One training-loss backward: per-leaf grads + BN running stats match.

    Runs in float64 on BOTH sides: at random init the fp32 gradient is
    chaotically ill-conditioned (torch's own grads swing 10-15% under a
    1e-6 input jitter — relu/maxpool boundary flips amplify fp noise), so
    fp32 closeness would be meaningless in both directions. In f64 the noise
    floor is ~1e-12 and any surviving difference is SEMANTIC."""
    ref_gate, ref_utils = ref_modules
    from jax import enable_x64

    model = SkipGateESANet(_seg_cfg())
    rgb, depth, labels, class_weights = _seg_batch(0, np.float64)
    # init in f32 (param initializers follow jnp.float_, which x64 flips)
    variables32 = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rgb, jnp.float32), jnp.asarray(depth, jnp.float32),
        train=False,
    )
    with enable_x64():
        variables = _to_f64(variables32)
        ref_net = _build_ref_net(ref_gate, variables, hard, double=True)

        # --- torch backward
        total_ref = _ref_seg_total(
            ref_net, ref_utils, rgb, depth, labels, class_weights
        )
        ref_net.zero_grad()
        total_ref.backward()
        ref_grads = {
            n: p.grad if p.grad is not None else torch.zeros_like(p)
            for n, p in ref_net.named_parameters()
        }

        # --- flax backward
        loss_fn = _flax_seg_loss_fn(
            model, class_weights, labels, rgb, depth, hard
        )
        (total, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"], variables["batch_stats"]
        )

        np.testing.assert_allclose(
            float(total), float(total_ref.detach()), rtol=1e-7
        )
        _compare_trees(grads, ref_grads, tol=1e-6, what="grad", floor=1e-7)

        # --- BN running stats after the train-mode forward
        ref_buffers = {
            n: b for n, b in ref_net.named_buffers()
            if n.endswith(("running_mean", "running_var"))
        }
        ours_stats = export_state_dict(variables["params"], new_bs)
        worst = (0.0, None)
        n_stats = 0
        for key, ref in ref_buffers.items():
            ref = np.asarray(ref.detach())
            got = np.asarray(ours_stats[key], np.float64)
            scale = max(np.abs(ref).max(), 1e-8)
            err = np.abs(got - ref).max() / scale
            if err > worst[0]:
                worst = (err, key)
            n_stats += 1
        assert n_stats > 20
        assert worst[0] < 1e-10, (
            f"BN running-stat mismatch: {worst[1]} rel-err {worst[0]:.2e}"
        )


@pytest.mark.parametrize("hard", [False, True], ids=["soft", "hard-ST"])
def test_seg_sgd_momentum_step_parity(ref_modules, hard):
    """Two full SGD(momentum 0.9, nesterov, wd 1e-4) steps: post-step params
    match the reference's optimizer math (second step exercises the momentum
    buffer). float64 both sides (see gradient-parity docstring)."""
    ref_gate, ref_utils = ref_modules
    from jax import enable_x64

    model = SkipGateESANet(_seg_cfg())
    # seed 2: seed 1 deterministically places one activation within ~1e-10
    # of a relu boundary during the step-1 forward, whose flip injects a
    # localized jump unrelated to optimizer math (seeds 2-4 verified clean)
    rgb, depth, labels, class_weights = _seg_batch(2, np.float64)
    variables32 = model.init(
        jax.random.PRNGKey(2),
        jnp.asarray(rgb, jnp.float32), jnp.asarray(depth, jnp.float32),
        train=False,
    )
    with enable_x64():
        variables = _to_f64(variables32)
        ref_net = _build_ref_net(ref_gate, variables, hard, double=True)
        opt = torch.optim.SGD(
            ref_net.parameters(), lr=LR, momentum=0.9, weight_decay=WD,
            nesterov=True,
        )

        cfg = SegTrainConfig(lr=LR, optimizer="SGD", momentum=0.9,
                             weight_decay=WD)
        tx = make_seg_optimizer(cfg)
        params, batch_stats = variables["params"], variables["batch_stats"]
        opt_state = tx.init(params)
        init_sd = export_state_dict(variables["params"])

        for step in range(2):
            total_ref = _ref_seg_total(
                ref_net, ref_utils, rgb, depth, labels, class_weights
            )
            opt.zero_grad()
            total_ref.backward()
            opt.step()

            loss_fn = _flax_seg_loss_fn(
                model, class_weights, labels, rgb, depth, hard
            )
            (_, batch_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch_stats)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

        # After step 1 both sides agree to 1e-10; by step 2 a single
        # relu-boundary flip (an activation within ~1e-10 of 0 in the step-1
        # forward) can inject a localized ~3e-6 jump even in f64, so the
        # post-step check bounds each leaf's error against ITS OWN update
        # magnitude (a wrong optimizer formula errs proportionally to the
        # update — caught at 1e-3 of it) with a small absolute allowance for
        # isolated flips.
        ours = export_state_dict(params, batch_stats)
        worst = (0.0, None)
        for key, ref in dict(ref_net.named_parameters()).items():
            ref = np.asarray(ref.detach())
            got = np.asarray(ours[key], np.float64)
            delta = np.abs(ref - init_sd[key]).max()
            allow = max(1e-3 * delta, 1e-5)
            err = np.abs(got - ref).max() / allow
            if err > worst[0]:
                worst = (err, key)
        assert worst[0] < 1.0, (
            f"post-step param mismatch: {worst[1]} exceeds allowance "
            f"{worst[0]:.1f}x"
        )
        # BN running stats after two train-mode forwards stay exact
        for key, buf in dict(ref_net.named_buffers()).items():
            if key.endswith("num_batches_tracked"):
                continue
            ref = np.asarray(buf.detach())
            got = np.asarray(ours[key], np.float64)
            scale = max(np.abs(ref).max(), 1e-8)
            assert np.abs(got - ref).max() / scale < 1e-6, key


# --------------------------------------------------------------------- IMDB
class _TMaxout(torch.nn.Module):
    def __init__(self, ind, out, k=2):
        super().__init__()
        self.lin = torch.nn.Linear(ind, out * k)
        self.out, self.k = out, k

    def forward(self, x):
        y = self.lin(x)
        return y.view(*y.shape[:-1], self.out, self.k).max(-1).values


class _TMaxOutMLP(torch.nn.Module):
    """Torch replica of nn/mlp.py::MaxOut_MLP (MultiBench contract):
    BN(in) → Maxout(h1) → BN(h1, affine-free) → Maxout(h2) → BN-free tail."""

    def __init__(self, ind, h1, h2):
        super().__init__()
        self.bn0 = torch.nn.BatchNorm1d(ind)
        self.max1 = _TMaxout(ind, h1)
        self.bn1 = torch.nn.BatchNorm1d(h1, affine=False)
        self.max2 = _TMaxout(h1, h2)
        self.bn2 = torch.nn.BatchNorm1d(h2, affine=False)

    def forward(self, x):
        return self.bn2(self.max2(self.bn1(self.max1(self.bn0(x)))))


class _TMLP(torch.nn.Module):
    def __init__(self, ind, hid, out):
        super().__init__()
        self.fc1 = torch.nn.Linear(ind, hid)
        self.fc2 = torch.nn.Linear(hid, out)

    def forward(self, x):
        return self.fc2(torch.relu(self.fc1(x)))


class _THead(torch.nn.Module):
    def __init__(self, ind, out):
        super().__init__()
        self.fc = torch.nn.Linear(ind, out)

    def forward(self, x):
        return self.fc(x)


class _TIMDBNet(torch.nn.Module):
    """Replica of the routed part of DynMMNet (imdb_dyn.py:29-114): text
    expert, late-fusion branch, MLP gate, DiffSoftmax mix,
    loss2 = weight[:, 1].mean()."""

    def __init__(self, n_classes=23):
        super().__init__()
        self.text_encoder = _TMLP(300, 512, 512)
        self.text_head = _TMLP(512, 512, n_classes)
        self.branch3_enc0 = _TMaxOutMLP(300, 512, 512)
        self.branch3_enc1 = _TMaxOutMLP(4096, 1024, 512)
        self.branch3_head = _THead(1024, n_classes)
        self.gate = _TMLP(4396, 128, 2)

    def forward(self, text, image, temp=1.0, hard=False):
        logits = self.gate(torch.cat([text, image], dim=1))
        y_soft = torch.softmax(logits / temp, dim=-1)
        if hard:  # straight-through (imdb_dyn.py:16-26)
            index = y_soft.max(-1, keepdim=True)[1]
            y_hard = torch.zeros_like(logits).scatter_(-1, index, 1.0)
            weight = y_hard - y_soft.detach() + y_soft
        else:
            weight = y_soft
        pred0 = self.text_head(self.text_encoder(text))
        fused = torch.cat(
            [self.branch3_enc0(text), self.branch3_enc1(image)], dim=1
        )
        pred1 = self.branch3_head(fused)
        out = weight[:, 0:1] * pred0 + weight[:, 1:2] * pred1
        return out, weight[:, 1].mean()


_IMDB_KEYMAP = {
    "branch3.encoders_0": "branch3_enc0",
    "branch3.encoders_1": "branch3_enc1",
    "branch3.head": "branch3_head",
}


def _imdb_torch_key(path, leaf):
    base = ".".join(path[:-1])
    for ours, theirs in _IMDB_KEYMAP.items():
        if base.startswith(ours):
            base = theirs + base[len(ours):]
            break
    name = {"kernel": "weight", "scale": "weight", "bias": "bias",
            "mean": "running_mean", "var": "running_var"}[leaf]
    return f"{base}.{name}"


def _flat(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flat(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _copy_imdb_weights(tnet, variables):
    sd = {}
    for path, v in _flat(variables["params"]):
        key = _imdb_torch_key(path, path[-1])
        v = np.asarray(v)
        if path[-1] == "kernel":
            v = v.T
        sd[key] = torch.tensor(np.ascontiguousarray(v))
    for path, v in _flat(variables["batch_stats"]):
        sd[_imdb_torch_key(path, path[-1])] = torch.tensor(np.asarray(v))
    missing, unexpected = tnet.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all(m.endswith("num_batches_tracked") for m in missing), missing


def _imdb_flax_to_torch(tree, batch_stats=None):
    out = {}
    for path, v in _flat(tree):
        v = np.asarray(v, np.float32)
        if path[-1] == "kernel":
            v = v.T
        out[_imdb_torch_key(path, path[-1])] = v
    if batch_stats:
        for path, v in _flat(batch_stats):
            out[_imdb_torch_key(path, path[-1])] = np.asarray(v, np.float32)
    return out


@pytest.mark.parametrize("hard", [False, True], ids=["soft", "hard-ST"])
def test_imdb_adamw_clip_step_parity(hard):
    """IMDB router: grads + 2 AdamW(wd 0.01) steps with global-norm clip and
    ``loss = BCE + λ·loss2`` match torch (Supervised_Learning.py:136-144).
    The clip threshold is set BELOW the actual grad norm so the clipping
    math itself is exercised, not bypassed."""
    from dynmm_tpu.models.modality.imdb import IMDBDynMMNet

    bs, lossw, lr, clip = 16, 0.5, 1e-3, 0.05
    rng = np.random.default_rng(3)
    text = rng.standard_normal((bs, 300)).astype(np.float32)
    image = rng.standard_normal((bs, 4096)).astype(np.float32)
    label = (rng.random((bs, 23)) < 0.3).astype(np.float32)

    model = IMDBDynMMNet(dropout_rate=0.0)
    variables = model.init(
        jax.random.PRNGKey(0), [jnp.asarray(text), jnp.asarray(image)],
        train=False,
    )
    # the unused image branch is off the loss path on both sides; drop it so
    # AdamW (whose update is nonzero at zero grad due to wd) sees the same
    # parameter set the reference optimizes (requires_grad filtering,
    # Supervised_Learning.py:97)
    params = {k: v for k, v in variables["params"].items()
              if not k.startswith("image_")}
    batch_stats = variables["batch_stats"]

    tnet = _TIMDBNet()
    _copy_imdb_weights(tnet, {"params": params, "batch_stats": batch_stats})
    tnet.train()
    t_text, t_image = torch.tensor(text), torch.tensor(image)
    t_label = torch.tensor(label)
    topt = torch.optim.AdamW(tnet.parameters(), lr=lr, weight_decay=0.01)
    bce = torch.nn.BCEWithLogitsLoss()

    def flax_loss(params, batch_stats):
        out, new_state = model.apply(
            {"params": {**params, **{k: v for k, v in variables["params"].items()
                                     if k.startswith("image_")}},
             "batch_stats": batch_stats},
            [jnp.asarray(text), jnp.asarray(image)],
            temp=1.0, hard=hard, train=True, mutable=["batch_stats"],
        )
        logits, loss2, _w = out
        loss1 = optax.sigmoid_binary_cross_entropy(
            logits, jnp.asarray(label)
        ).mean()
        return loss1 + lossw * loss2, new_state["batch_stats"]

    tx = optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(lr, weight_decay=0.01),
    )
    opt_state = tx.init(params)

    for step in range(2):
        out, loss2 = tnet(t_text, t_image, hard=hard)
        loss_ref = bce(out, t_label) + lossw * loss2
        topt.zero_grad()
        loss_ref.backward()
        if step == 0:
            ref_grads = {n: p.grad.clone()
                         for n, p in tnet.named_parameters()}
            total_norm = torch.norm(
                torch.stack([g.norm() for g in ref_grads.values()])
            )
            assert float(total_norm) > clip  # clipping actually fires
        torch.nn.utils.clip_grad_norm_(tnet.parameters(), clip)
        topt.step()

        (loss, batch_stats), grads = jax.value_and_grad(
            flax_loss, has_aux=True
        )(params, batch_stats)
        if step == 0:
            np.testing.assert_allclose(
                float(loss), float(loss_ref.detach()), rtol=1e-5
            )
            ours_g = _imdb_flax_to_torch(grads)
            for key, ref in ref_grads.items():
                ref = np.asarray(ref)
                scale = max(np.abs(ref).max(), 1e-8)
                np.testing.assert_allclose(
                    ours_g[key], ref, atol=2e-4 * scale, rtol=0,
                    err_msg=f"grad {key}",
                )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    ours_p = _imdb_flax_to_torch(params, batch_stats)
    worst = (0.0, None)
    for key, ref in dict(tnet.named_parameters()).items():
        ref = np.asarray(ref.detach())
        # Adam normalizes per element (m̂/√v̂ ≈ ±1), so fp-level grad noise
        # (measured ~1e-6 rel) can move near-zero-grad elements by a visible
        # fraction of one step; measure divergence in units of the step size
        err = np.abs(ours_p[key] - ref).max() / lr
        if err > worst[0]:
            worst = (err, key)
    assert worst[0] < 3e-2, (
        f"post-step param {worst[1]} diverges by {worst[0]:.2e} steps"
    )
    # BN running stats after two train-mode forwards
    for key, ref in dict(tnet.named_buffers()).items():
        if key.endswith("num_batches_tracked"):
            continue
        ref = np.asarray(ref.detach())
        scale = max(np.abs(ref).max(), 1e-8)
        np.testing.assert_allclose(
            ours_p[key], ref, atol=1e-5 * scale, rtol=0, err_msg=key
        )
