"""Segmentation training/eval engine — TPU equivalent of the reference's
``FusionDynMM/train.py`` + the eval core of ``eval.py``.

Reference semantics reproduced:
* SGD(momentum 0.9, nesterov) / Adam, weight decay, OneCycle LR stepped once
  per epoch with div_factor 25, pct_start 0.1, cos anneal, final_div 1e4
  (train.py:120-128)
* class-weighted multi-scale CE + flop-budget hinge:
  ``total = Σ CE_scale + ratio · max(0, loss_flop − budget)`` (train.py:313-319)
* exponential temperature annealing; stage flags per epoch:
  ``ini_stage = e < epoch_ini``, ``hard_gate = e ≥ epoch_hard`` (train.py:193-197)
* freeze-all-but-gate (train.py:139-141 + model.freeze)
* validation per camera: bilinear-resize predictions to the original label
  size, argmax, void-mask, label−1, confusion-matrix mIoU (train.py:368-551)
* CSV logging of losses / mIoU / lr / phase timings; best-mIoU state kept;
  periodic + final checkpoints; NaN loss guard (train.py:334-335)

TPU redesign: the whole train step (dense soft-gated forward over both
modality branches, 4-scale loss, backward, SGD) is one jit-compiled program;
the eval step (forward → full-res bilinear resize → argmax) is a second one.
Static mode flags (ini/hard/baseline) select among a handful of compiled
variants; the temperature and learning rate stream in as traced scalars so
annealing never recompiles.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dynmm_tpu.core.resource import GateStats
from dynmm_tpu.core.schedules import ExpDecayTemp
from dynmm_tpu.nn.layers import first_argmax, resize_bilinear
from dynmm_tpu.train.metrics import ConfusionMatrix
from dynmm_tpu.train.seg_losses import StreamingValidLoss, multiscale_ce
from dynmm_tpu.utils.checkpoint import (load_ckpt, save_ckpt,
                                         save_ckpt_every_epoch)
from dynmm_tpu.utils.logger import CSVLogger

DOWN_RATES = (8, 16, 32)


@dataclasses.dataclass
class SegTrainConfig:
    epochs: int = 500
    lr: float = 0.01
    optimizer: str = "SGD"
    momentum: float = 0.9
    weight_decay: float = 1e-4
    batch_size: int = 8
    loss_ratio: float = 0.0
    flop_budget: float = 0.0
    temp: float = 1.0
    end_temp: float = 0.001
    epoch_ini: int = 0
    epoch_hard: int = 500
    eval_every: int = 2
    save_every: int = 100
    baseline: bool = False
    freeze: bool = False
    soft_eval: bool = False
    dynamic: bool = True
    global_gate: bool = True  # SkipGateESANet (global) vs SkipESANet (local)
    grad_accum: int = 1       # optimizer-step every N batches (optax.MultiSteps)
    modality: str = "rgbd"
    debug: bool = False  # one batch per train/valid pass
    # eval/serving: host-pack stem inputs 2×2 space-to-depth before the
    # device transfer (resnet.space_to_depth_host) — the stem then runs the
    # 5.5×-faster packed 4×4 conv with no on-device shuffle; bit-equal
    # outputs (tests/test_stem_lowering.py). Skipped when H or W is odd.
    packed_stem: bool = False
    # quantify the quarter-res serving knob (predict.py --output_res
    # quarter): eval on H/4 logits, argmax, nearest-resize the class map to
    # the label resolution. Reference-parity eval keeps this False (the
    # reference's chain is full-res logits → bilinear resize → argmax).
    # Global-gate / static models only; valid-loss logging is skipped (the
    # low-res logits don't match the label resolution).
    low_res_eval: bool = False
    # > 0: eval through forward_routed_compact with a STRICT single-rung
    # capacity schedule (skip_gate.capacity_ladders(ratios, bs, factor)) —
    # MoE capacity-factor drop semantics, zero lax.cond boundaries. The
    # accuracy knob for the throughput-serving mode (eval.py
    # --capacity_factor); the trainer's ``serve_ratios`` (estimated branch
    # ratios) must be set before validation. Requires dynamic global-gate
    # hard eval. 0.0 = exact reference-parity eval chain.
    serve_capacity_factor: float = 0.0


def onecycle_lr(cfg: SegTrainConfig):
    """Per-epoch OneCycle schedule matching torch OneCycleLR defaults used by
    the reference. (optax's onecycle emits NaN for very short runs — smoke
    tests and debug runs fall back to a constant lr.)"""
    if cfg.epochs < 5:
        return lambda epoch: cfg.lr
    sched = optax.cosine_onecycle_schedule(
        transition_steps=cfg.epochs,
        peak_value=cfg.lr,
        pct_start=0.1,
        div_factor=25.0,
        final_div_factor=1e4,
    )

    def safe(epoch):
        lr = float(sched(epoch))
        return lr if np.isfinite(lr) else cfg.lr

    return safe


def make_seg_optimizer(cfg: SegTrainConfig, params=None):
    if cfg.optimizer == "SGD":
        base = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.sgd(learning_rate, momentum=cfg.momentum, nesterov=True),
            )
        )(learning_rate=cfg.lr)
    elif cfg.optimizer == "Adam":
        base = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.adam(learning_rate, b1=0.9, b2=0.999),
            )
        )(learning_rate=cfg.lr)
    else:
        raise NotImplementedError(
            f"Currently only SGD and Adam as optimizers are supported. Got {cfg.optimizer}"
        )
    if cfg.grad_accum > 1:
        base = optax.MultiSteps(base, every_k_schedule=cfg.grad_accum)
    if cfg.freeze and cfg.dynamic and params is not None:
        labels = jax.tree_util.tree_map_with_path(
            lambda path, _: "train"
            if any("gate" in str(getattr(p, "key", "")) for p in path)
            else "freeze",
            params,
        )
        return optax.multi_transform(
            {"train": base, "freeze": optax.set_to_zero()}, labels
        )
    return base


def _set_lr(opt_state, lr):
    """Update the injected learning rate inside the optimizer state pytree."""

    def visit(node):
        if hasattr(node, "hyperparams") and "learning_rate" in node.hyperparams:
            node.hyperparams["learning_rate"] = jnp.asarray(
                lr, dtype=jnp.asarray(node.hyperparams["learning_rate"]).dtype
            )
        if isinstance(node, tuple):
            for sub in node:
                visit(sub)
        inner = getattr(node, "inner_state", None)
        if inner is not None:
            visit(inner)

    visit(opt_state)
    return opt_state


class SegTrainer:
    """Engine for ESANet-family models (static or gated).

    Pass a ``jax.sharding.Mesh`` (axes 'data'[, 'model']) to scale out:
    batches shard over 'data', params replicate (GSPMD inserts the gradient
    all-reduce), wide kernels optionally shard over 'model'. The reference has
    no distributed training at all (SURVEY §2.4) — this is the TPU-native
    scale-out path validated by ``__graft_entry__.dryrun_multichip``.
    """

    def __init__(self, model, cfg: SegTrainConfig, class_weights: np.ndarray,
                 mesh=None):
        self.model = model
        self.cfg = cfg
        self.class_weights = jnp.asarray(class_weights, jnp.float32)
        self._train_steps: dict = {}
        self._eval_steps: dict = {}
        self.tx = None
        self.mesh = mesh
        # estimated branch ratios feeding cfg.serve_capacity_factor's
        # capacity schedule (set by eval.py before validation)
        self.serve_ratios = None

    def _maybe_shard_batch(self, *arrays):
        if self.mesh is None:
            return arrays
        import jax as _jax

        from dynmm_tpu.parallel import make_global_batch, shard_batch

        # eval loaders can yield ragged tail batches; shard only when the
        # batch divides the data axis, else leave host-replicated (jit still
        # runs it under the mesh)
        n_data = self.mesh.shape["data"]
        if _jax.process_count() > 1:
            # multi-host: each process feeds only its own devices' rows
            # (loader serves a ProcessShard view; SURVEY §5.8), so the
            # LOCAL batch must divide this process's share of the 'data'
            # axis — not the global axis size (a 4-row local batch on an
            # 8-device 2-process mesh is exactly right, 4 rows per host)
            local = max(n_data // _jax.process_count(), 1)
            if any(a.shape[0] % local != 0 for a in arrays):
                return arrays
            return make_global_batch(arrays, self.mesh)
        if any(a.shape[0] % n_data != 0 for a in arrays):
            return arrays
        return shard_batch(arrays, self.mesh)

    def _mesh_ctx(self):
        import contextlib

        return (
            jax.set_mesh(self.mesh) if self.mesh is not None
            else contextlib.nullcontext()
        )

    # ------------------------------------------------------------------ state
    def init_state(self, rng, sample_batch) -> dict:
        image = jnp.asarray(sample_batch["image"][:1])
        depth = jnp.asarray(sample_batch["depth"][:1])
        inputs = self._inputs(image, depth)
        if self.cfg.dynamic and not self.cfg.global_gate:
            variables = self.model.init(rng, *inputs, jax.random.PRNGKey(0))
        else:
            variables = self.model.init(rng, *inputs, train=False)
        params = variables["params"]
        self.tx = make_seg_optimizer(self.cfg, params)
        state = {
            "params": params,
            "model_state": {k: v for k, v in variables.items() if k != "params"},
            "opt_state": self.tx.init(params),
        }
        if self.mesh is not None:
            from dynmm_tpu.parallel import replicate, shard_params

            state["params"] = shard_params(state["params"], self.mesh)
            state["opt_state"] = shard_params(state["opt_state"], self.mesh)
            state["model_state"] = replicate(state["model_state"], self.mesh)
        return state

    # ------------------------------------------------------------------ steps
    def _inputs(self, image, depth):
        """Model positional inputs per modality (rgbd | rgb | depth)."""
        if self.cfg.modality == "rgbd":
            return (image, depth)
        if self.cfg.modality == "rgb":
            return (image,)
        return (depth,)

    def _model_train_out(self, variables, image, depth, temp, flags, rng):
        """Returns (preds_4scale, loss_flop, new_model_state)."""
        kwargs: dict[str, Any] = {"train": True, "mutable": ["batch_stats"]}
        inputs = self._inputs(image, depth)
        if self.cfg.dynamic and self.cfg.global_gate:
            kwargs.update(
                temp=temp,
                hard=flags["hard"],
                baseline=flags["baseline"],
                ini_stage=flags["ini"],
            )
            if flags["ini"]:
                kwargs["rng"] = rng
            (preds, loss_flop), new_state = self.model.apply(
                variables, *inputs, **kwargs
            )
        elif self.cfg.dynamic:
            # local-gate SkipESANet: sampled Gumbel gates (rng), no resource loss
            kwargs.update(
                temp=temp, hard=flags["hard"], ini_stage=flags["ini"]
            )
            preds, new_state = self.model.apply(variables, *inputs, rng, **kwargs)
            loss_flop = jnp.zeros(())
        else:
            preds, new_state = self.model.apply(variables, *inputs, **kwargs)
            loss_flop = jnp.zeros(())
        return preds, loss_flop, new_state

    def _get_train_step(self, flags_key):
        if flags_key in self._train_steps:
            return self._train_steps[flags_key]
        flags = dict(zip(("hard", "baseline", "ini"), flags_key))
        cfg = self.cfg

        def step(state, image, depth, targets, lr, temp, rng):
            def loss_fn(params):
                preds, loss_flop, new_state = self._model_train_out(
                    {"params": params, **state["model_state"]},
                    image, depth, temp, flags, rng,
                )
                loss_seg, per_scale = multiscale_ce(
                    preds, targets, self.class_weights
                )
                total = loss_seg
                if cfg.loss_ratio > 0:
                    total = total + cfg.loss_ratio * jnp.maximum(
                        loss_flop - cfg.flop_budget, 0.0
                    )
                return total, (per_scale, loss_flop, new_state)

            (total, (per_scale, loss_flop, new_state)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(state["params"])
            )
            opt_state = _set_lr(state["opt_state"], lr)
            updates, opt_state = self.tx.update(
                grads, opt_state, state["params"]
            )
            params = optax.apply_updates(state["params"], updates)
            new_full = {
                "params": params,
                "model_state": new_state,
                "opt_state": opt_state,
            }
            return new_full, total, jnp.stack(per_scale), loss_flop

        jitted = jax.jit(step)
        self._train_steps[flags_key] = jitted
        return jitted

    def _get_eval_step(self, key):
        """key = (hard, baseline, ini, out_h, out_w, low_res)."""
        if key in self._eval_steps:
            return self._eval_steps[key]
        hard, baseline, ini, out_h, out_w, low_res = key
        if low_res and self.cfg.dynamic and not self.cfg.global_gate:
            raise ValueError(
                "low_res_eval supports global-gate / static models only"
            )

        def step(state, image, depth):
            variables = {"params": state["params"], **state["model_state"]}
            inputs = self._inputs(image, depth)
            if (self.cfg.dynamic and self.cfg.global_gate
                    and self.cfg.serve_capacity_factor > 0):
                # strict capacity-factor serving (MoE drop semantics, zero
                # cond boundaries) — the accuracy side of the bench's
                # *_strict candidates. caps are static per batch size
                # (trace-time shape), derived from the estimated ratios.
                if not hard or baseline or ini:
                    raise ValueError(
                        "serve_capacity_factor needs hard non-baseline "
                        "non-ini eval (it scores the serving chain)")
                if self.serve_ratios is None:
                    raise ValueError(
                        "set trainer.serve_ratios (estimated branch "
                        "ratios) before capacity-factor validation")
                from dynmm_tpu.models.skip_gate import capacity_ladders

                caps = capacity_ladders(
                    self.serve_ratios, image.shape[0],
                    capacity_factor=self.cfg.serve_capacity_factor)
                pred, weight = self.model.apply(
                    variables, *inputs, caps=caps, strict_caps=True,
                    low_res=low_res, return_weight=True,
                    method=self.model.forward_routed_compact,
                )
            elif self.cfg.dynamic and self.cfg.global_gate:
                # the reference's ini_stage flag persists into validation
                # (train.py:195 is not reset before validate)
                kwargs = dict(hard=hard, baseline=baseline, return_weight=True)
                if ini:
                    kwargs.update(ini_stage=True, rng=jax.random.PRNGKey(0))
                pred, weight = self.model.apply(
                    variables, *inputs, train=False, low_res=low_res, **kwargs
                )
            elif self.cfg.dynamic:
                pred, weights = self.model.apply(
                    variables, *inputs, jax.random.PRNGKey(0), train=False,
                    hard=hard, test=True, return_weights=True,
                )
                weight = weights[-1]
            else:
                pred = self.model.apply(
                    variables, *inputs, train=False, low_res=low_res
                )
                weight = jnp.zeros((image.shape[0], 0))
            pred_logits = pred
            if low_res:
                # the quarter-res serving chain (predict.py --output_res
                # quarter): argmax the native H/4 logits, nearest-resize the
                # tiny class map — 16× fewer logits bytes than the
                # reference's resize→argmax chain below
                pred_map = first_argmax(pred_logits, axis=-1)
                pred_map = jax.image.resize(
                    pred_map, (pred_map.shape[0], out_h, out_w),
                    method="nearest",
                )
                return pred_logits, pred_map, weight
            pred_full = resize_bilinear(pred_logits, (out_h, out_w))
            # first_argmax, not jnp.argmax: the variadic argmax reduce costs
            # +16.3 ms on the bs=8 logits map in-graph (perf_argmax_net.py)
            return pred_logits, first_argmax(pred_full, axis=-1), weight

        jitted = jax.jit(step)
        self._eval_steps[key] = jitted
        return jitted

    # ------------------------------------------------------------------ loops
    def train_one_epoch(self, state, loader, epoch: int, lr: float, temp: float):
        cfg = self.cfg
        flags_key = (
            bool(epoch >= cfg.epoch_hard),
            bool(cfg.baseline),
            bool(epoch < cfg.epoch_ini),
        )
        step = self._get_train_step(flags_key)
        t0 = time.time()
        totals, per_scales, flops = [], [], []
        rng = jax.random.PRNGKey(epoch)

        for i, batch in enumerate(loader):
            rng, sub = jax.random.split(rng)
            targets = [jnp.asarray(batch["label"])] + [
                jnp.asarray(batch["label_down"][r]) for r in DOWN_RATES
            ]
            image, depth = batch["image"], batch["depth"]
            if (cfg.packed_stem and image.shape[-1] == 3
                    and image.shape[1] % 2 == 0 and image.shape[2] % 2 == 0):
                # raw-layout guard (C==3): loaders built by prepare_data
                # already pack in their prefetch thread (pack_stem_batch);
                # this in-loop fallback covers direct-engine callers.
                # Gradients flow through the kernel re-tiling (_s2d_kernel
                # is a linear scatter of conv1/kernel) and BN sees identical
                # activations — the training math is unchanged
                from dynmm_tpu.models.resnet import space_to_depth_host

                image = space_to_depth_host(np.asarray(image))
                depth = space_to_depth_host(np.asarray(depth))
            image, depth, *targets = self._maybe_shard_batch(
                jnp.asarray(image), jnp.asarray(depth), *targets
            )
            with self._mesh_ctx():
                state, total, per_scale, loss_flop = step(
                    state, image, depth, targets, lr, temp, sub
                )
            total = float(total)
            if np.isnan(total):
                raise ValueError("Loss is None")
            totals.append(total)
            per_scales.append(np.asarray(per_scale))
            flops.append(float(loss_flop))
            if cfg.debug:
                break
        per_scales = np.mean(per_scales, axis=0)
        logs = {
            "epoch": epoch,
            "lr_0": lr,
            "time_training": time.time() - t0,
            "loss_train_total": float(np.mean(totals)),
            "loss_flop": float(np.mean(flops)) if cfg.loss_ratio > 0 else 0.0,
            "loss_train_full_size": float(per_scales[0]),
        }
        for i, r in enumerate(DOWN_RATES):
            logs[f"loss_train_down_{r}"] = float(per_scales[i + 1])
        return state, logs

    def calibrate_quant(self, calib_model, state, loader,
                        n_batches: int = 8, estimator: str = "absmax",
                        percentile: float = 99.9):
        """Abs-max int8 PTQ calibration (``utils/quantize.py``) over the
        first ``n_batches`` CLEAN batches of ``loader``, with the exact
        serving input prep (modality selection, ``--packed_stem`` packing).
        ``calib_model`` is the ``quant='calib'`` twin of ``self.model``;
        returns the ``quant`` collection to merge into
        ``state['model_state']`` before evaluating/serving the
        ``quant='int8'`` twin. Global-gate / static models only (matching
        ``build_model``'s --quant guard); hard-gate forward, the serving
        regime the scales must cover."""
        import jax.numpy as jnp

        from dynmm_tpu.utils.quantize import calibrate, select_scales

        cfg = self.cfg

        def batches():
            n = 0
            for batch in loader:
                if n >= n_batches:
                    break
                image, depth = batch["image"], batch["depth"]
                if (cfg.packed_stem and image.shape[-1] == 3
                        and image.shape[1] % 2 == 0
                        and image.shape[2] % 2 == 0):
                    from dynmm_tpu.models.resnet import space_to_depth_host

                    image = space_to_depth_host(np.asarray(image))
                    depth = space_to_depth_host(np.asarray(depth))
                yield tuple(jnp.asarray(x)
                            for x in self._inputs(image, depth))
                n += 1

        variables = {"params": state["params"], **state["model_state"]}
        kwargs = {"train": False}
        if cfg.dynamic and cfg.global_gate:
            kwargs.update(hard=True, baseline=bool(cfg.baseline))
        q = calibrate(calib_model, variables, batches(), **kwargs)
        return select_scales(q, estimator=estimator, percentile=percentile)

    def validate(
        self,
        state,
        loader,
        logs: Optional[dict] = None,
        noise_mode: int = -1,
        noise: float = 0.0,
        run_seed: int = 0,
        valid_loss: Optional[StreamingValidLoss] = None,
        collect_weights: Optional[GateStats] = None,
        ini_stage: bool = False,
        out_cms: Optional[dict] = None,
    ):
        """Per-camera eval: returns ({camera: miou}, logs). Matches the
        reference post-processing chain exactly (resize→argmax→mask→−1).
        ``out_cms`` (if given) is filled with {camera: confusion matrix array}
        for the caller to pickle (train.py:520-527)."""
        cfg = self.cfg
        logs = logs if logs is not None else {}
        n_classes = int(self.class_weights.shape[0])
        cameras = getattr(loader.dataset, "cameras", ("kv1",))
        split = getattr(loader.dataset, "split", "test")
        hard = not cfg.soft_eval
        rng = np.random.default_rng(run_seed)

        t_val0 = time.time()
        self._phase_forward = self._phase_post = self._phase_cm = 0.0
        miou = {}
        if valid_loss is not None:
            valid_loss.reset()
        import contextlib

        for camera in cameras:
            cm = ConfusionMatrix(n_classes)
            camera_ctx = (
                loader.dataset.filter_camera(camera)
                if hasattr(loader.dataset, "filter_camera")
                else contextlib.nullcontext()
            )
            with camera_ctx:
                self._validate_camera(
                    state, loader, cm, noise_mode, noise, rng, valid_loss,
                    collect_weights, hard, ini_stage,
                )
            miou[camera] = cm.miou()
            logs[f"mIoU_{split}_{camera}"] = miou[camera]
            if out_cms is not None:
                out_cms[camera] = np.asarray(cm.matrix)

        logs["time_validation"] = time.time() - t_val0
        logs["time_forward"] = self._phase_forward
        logs["time_post_processing"] = self._phase_post
        logs["time_confusion_matrix"] = self._phase_cm
        if valid_loss is not None:
            logs[f"loss_{split}"] = valid_loss.compute()
        return miou, logs

    def _validate_camera(
        self, state, loader, cm, noise_mode, noise, rng, valid_loss,
        collect_weights, hard, ini_stage=False,
    ):
        cfg = self.cfg
        for batch in loader:
            image = batch["image"]
            depth = batch["depth"]
            if noise_mode >= 0:
                from dynmm_tpu.data.seg_preprocessing import inject_eval_noise

                image, depth = inject_eval_noise(
                    image, depth, noise_mode, noise, rng
                )
            label_orig = batch.get("label_orig", batch.get("label"))
            out_h, out_w = label_orig.shape[1], label_orig.shape[2]
            if (cfg.packed_stem and image.shape[-1] == 3
                    and image.shape[1] % 2 == 0 and image.shape[2] % 2 == 0):
                # packing AFTER noise injection keeps seeded noise draws
                # identical with and without --packed_stem (raw layout)
                from dynmm_tpu.models.resnet import space_to_depth_host

                image = space_to_depth_host(np.asarray(image))
                depth = space_to_depth_host(np.asarray(depth))
            step = self._get_eval_step(
                (hard, bool(cfg.baseline), bool(ini_stage), out_h, out_w,
                 bool(cfg.low_res_eval))
            )

            t0 = time.time()
            # mesh validation: batches shard over 'data' like training
            # (SURVEY §5.8); per-camera mIoU math is unchanged
            image_j, depth_j = self._maybe_shard_batch(
                jnp.asarray(image), jnp.asarray(depth)
            )
            with self._mesh_ctx():
                pred_logits, pred_full, weight = step(state, image_j, depth_j)
            pred_full = np.asarray(pred_full)
            self._phase_forward += time.time() - t0

            t0 = time.time()
            if (valid_loss is not None and "label" in batch
                    and not cfg.low_res_eval):  # low-res logits ≠ label res
                valid_loss.add_batch(pred_logits, jnp.asarray(batch["label"]))
            if collect_weights is not None:
                collect_weights.append(weight)
            mask = label_orig > 0
            lab = label_orig[mask] - 1
            pred_m = pred_full[mask]
            self._phase_post += time.time() - t0

            t0 = time.time()
            cm.update(lab, pred_m)
            self._phase_cm += time.time() - t0
            if cfg.debug:
                break

    # ------------------------------------------------------------------- fit
    def fit(
        self,
        state,
        train_loader,
        valid_loader,
        ckpt_dir: str,
        start_epoch: int = 0,
        best_miou: float = 0.0,
        best_miou_epoch: int = 0,
        log_fn=print,
    ):
        cfg = self.cfg
        os.makedirs(ckpt_dir, exist_ok=True)
        os.makedirs(os.path.join(ckpt_dir, "confusion_matrices"), exist_ok=True)
        lr_sched = onecycle_lr(cfg)
        temp_sched = ExpDecayTemp(cfg.temp, cfg.end_temp, cfg.epoch_hard)
        cameras = getattr(valid_loader.dataset, "cameras", ("kv1",))
        split = getattr(valid_loader.dataset, "split", "test")

        log_keys = (
            [f"mIoU_{split}_{c}" for c in cameras]
            + ["epoch", "lr_0", "loss_train_total", "loss_train_full_size", "loss_flop"]
            + [f"loss_train_down_{r}" for r in DOWN_RATES]
            + [f"loss_{split}"]
            + ["time_training", "time_validation", "time_forward",
               "time_post_processing", "time_confusion_matrix"]
        )
        csvlogger = CSVLogger(log_keys, os.path.join(ckpt_dir, "logs.csv"))
        best_state = state

        for epoch in range(start_epoch, cfg.epochs):
            assert cfg.epoch_ini <= cfg.epoch_hard
            lr = float(lr_sched(epoch))
            temp = float(temp_sched(epoch))
            state, logs = self.train_one_epoch(state, train_loader, epoch, lr, temp)
            log_fn(
                f"Epoch {epoch} | Train loss {logs['loss_train_total']:.4f} | "
                f"Flop loss {logs['loss_flop']:.4f} | Temperature {temp:.5f} | lr {lr:.6f}"
            )
            if epoch == start_epoch or epoch % cfg.eval_every == 0:
                cms: dict = {}
                miou, logs = self.validate(
                    state, valid_loader, logs,
                    valid_loss=StreamingValidLoss(self.class_weights),
                    ini_stage=epoch < cfg.epoch_ini,
                    out_cms=cms,
                )
                # per-epoch confusion-matrix pickles, for computing other
                # metrics later (reference train.py:520-527)
                with open(
                    os.path.join(ckpt_dir, "confusion_matrices",
                                 f"cm_epoch_{epoch}.pickle"), "wb",
                ) as f:
                    pickle.dump(cms, f, protocol=pickle.HIGHEST_PROTOCOL)
                cam0 = cameras[0]
                if miou[cam0] > best_miou:
                    best_miou = miou[cam0]
                    best_miou_epoch = epoch
                    best_state = jax.tree_util.tree_map(lambda x: x, state)
                log_fn(
                    f"Test mIoU {miou[cam0]:.4f} | Best mIoU {best_miou:.4f} "
                    f"| Best epoch {best_miou_epoch}"
                )
            csvlogger.write_logs(logs)
            # rolling resume checkpoint with optimizer state + best_miou
            # (reference src/utils.py:118-143 save_ckpt_every_epoch)
            save_ckpt_every_epoch(ckpt_dir, state, epoch, best_miou,
                                  best_miou_epoch)
            if epoch >= 10 and epoch % cfg.save_every == cfg.save_every - 1:
                save_ckpt(ckpt_dir, state, epoch)

        save_ckpt(ckpt_dir, best_state, best_miou_epoch)
        with open(os.path.join(ckpt_dir, "finished.txt"), "w") as f:
            f.write(f"best miou: {best_miou}\n")
            f.write(f"best miou epoch: {best_miou_epoch}\n")
        csvlogger.close()
        return best_state, best_miou, best_miou_epoch
