"""Generic supervised multimodal trainer — the TPU equivalent of the
reference's ``ModalityDynMM/training_structures/Supervised_Learning.py:84-248``.

Reference semantics reproduced:
* optimizer over trainable params only (freeze masks), AdamW default for the
  DynMM configs, gradient clipping at global-norm 8 (:143)
* MoE hook: model returns ``(out, loss2, weight)``; total loss =
  ``loss1 + lossw * loss2`` (:136) — ``lossw`` is the paper's λ
* per-task model selection: classification → accuracy, multilabel → f1-macro,
  regression → val loss (:200-236); early stop at patience > 7 (:237)
* per-epoch gate statistics via ``GateStats`` (:154-155, 193-194)

TPU redesign: the whole update (forward, both branches, gate mix, backward,
clip, AdamW) is one jit-compiled step; batches come from ``ArrayLoader`` with
static shapes; eval uses padded tail batches with validity masks instead of
ragged remainders.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dynmm_tpu.core.resource import GateStats
from dynmm_tpu.data.loader import ArrayLoader, Batch
from dynmm_tpu.train import metrics as M
from dynmm_tpu.train.objectives import get_objective


@dataclasses.dataclass
class SupervisedConfig:
    task: str = "classification"  # classification|multilabel|regression|posneg-classification
    objective: str = "cross_entropy"
    epochs: int = 50
    lr: float = 1e-4
    weight_decay: float = 0.01
    optimizer: str = "adamw"
    clip_val: float = 8.0
    early_stop: bool = True
    patience: int = 7
    lossw: float = 0.0          # λ on the resource loss
    additional_loss: bool = False  # model returns (out, loss2, weight)
    auprc: bool = False         # report AUPRC for binary classification
    batch_dropout_rng: bool = True


def make_optimizer(cfg: SupervisedConfig, trainable_mask=None) -> optax.GradientTransformation:
    if cfg.optimizer == "adamw":
        opt = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "adam":
        opt = optax.adam(cfg.lr)
    elif cfg.optimizer == "sgd":
        opt = optax.sgd(cfg.lr, momentum=0.9, nesterov=True)
    elif cfg.optimizer == "rmsprop":
        opt = optax.rmsprop(cfg.lr)
    else:
        raise ValueError(cfg.optimizer)
    opt = optax.chain(optax.clip_by_global_norm(cfg.clip_val), opt)
    if trainable_mask is not None:
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()},
            trainable_mask,
        )
    return opt


def freeze_mask(params, trainable_pred: Callable[[tuple], bool]):
    """Label pytree for optax.multi_transform: 'train' where
    ``trainable_pred(path)`` else 'freeze'. Equivalent of the reference's
    requires_grad filtering (Supervised_Learning.py:97; imdb_dyn.py:52-57)."""
    flat = jax.tree_util.tree_map_with_path(
        lambda path, _: "train"
        if trainable_pred(tuple(getattr(p, "key", getattr(p, "idx", None)) for p in path))
        else "freeze",
        params,
    )
    return flat


class SupervisedTrainer:
    """Trainer for MMDL-style and DynMM (MoE) models.

    ``model_call(variables, batch, train, rngs, mutable) -> (out[, loss2,
    weight], new_model_state)`` is provided by the caller to adapt each
    model's signature.
    """

    def __init__(
        self,
        model_call: Callable,
        cfg: SupervisedConfig,
        trainable_pred: Optional[Callable] = None,
    ):
        self.model_call = model_call
        self.cfg = cfg
        self.objective = get_objective(cfg.objective)
        self.trainable_pred = trainable_pred
        self._train_step = None
        self._eval_step = None

    # ------------------------------------------------------------------ state
    def init_state(self, variables) -> dict:
        params = variables["params"]
        mask = (
            freeze_mask(params, self.trainable_pred)
            if self.trainable_pred is not None
            else None
        )
        self.tx = make_optimizer(self.cfg, mask)
        return {
            "params": params,
            "model_state": {k: v for k, v in variables.items() if k != "params"},
            "opt_state": self.tx.init(params),
        }

    # ------------------------------------------------------------------ steps
    def _build_train_step(self):
        cfg = self.cfg

        def loss_fn(params, model_state, batch, rng):
            variables = {"params": params, **model_state}
            out, loss2, _w, new_state = self.model_call(
                variables, batch, train=True, rng=rng
            )
            loss1 = self.objective(out, batch["label"])
            loss = loss1 + cfg.lossw * loss2 if cfg.additional_loss else loss1
            return loss, (loss1, new_state)

        def step(state, batch, rng):
            (loss, (loss1, new_model_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state["params"], state["model_state"], batch, rng)
            updates, opt_state = self.tx.update(
                grads, state["opt_state"], state["params"]
            )
            params = optax.apply_updates(state["params"], updates)
            return (
                {
                    "params": params,
                    "model_state": new_model_state,
                    "opt_state": opt_state,
                },
                loss,
                loss1,
            )

        return jax.jit(step)

    def _build_eval_step(self):
        def step(state, batch, rng):
            variables = {"params": state["params"], **state["model_state"]}
            out, loss2, w, _ = self.model_call(variables, batch, train=False, rng=rng)
            loss1 = self.objective(out, batch["label"])
            return out, loss1, loss2, w

        return jax.jit(step)

    # ------------------------------------------------------------------ loops
    @staticmethod
    def _to_device_batch(batch: Batch) -> dict:
        d = {
            "inputs": [jnp.asarray(x) for x in batch.inputs],
            "label": jnp.asarray(batch.label),
        }
        d["lengths"] = (
            [jnp.asarray(l) for l in batch.lengths] if batch.lengths else None
        )
        return d

    def train_epoch(self, state, loader: ArrayLoader, rng) -> tuple[dict, float]:
        if self._train_step is None:
            self._train_step = self._build_train_step()
        total, count = 0.0, 0
        for batch in loader:
            rng, sub = jax.random.split(rng)
            state, loss, _ = self._train_step(
                state, self._to_device_batch(batch), sub
            )
            total += float(loss) * len(batch.label)
            count += len(batch.label)
        return state, total / max(count, 1)

    def evaluate(self, state, loader: ArrayLoader, collect_weights=False) -> dict:
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        cfg = self.cfg
        stats = GateStats()
        preds, trues, losses, totals = [], [], 0.0, 0
        rng = jax.random.PRNGKey(0)
        for batch in loader:
            out, loss1, _loss2, w = self._eval_step(
                state, self._to_device_batch(batch), rng
            )
            out = np.asarray(out)
            if batch.valid is not None:
                out = out[batch.valid]
                label = batch.label[batch.valid]
                if w is not None:
                    w = np.asarray(w)[batch.valid]
            else:
                label = batch.label
            if collect_weights and w is not None:
                stats.append(w)
            losses += float(loss1) * len(label)
            totals += len(label)
            preds.append(out)
            trues.append(label)
        preds = np.concatenate(preds)
        trues = np.concatenate(trues)
        out = {"loss": losses / max(totals, 1)}
        if cfg.task == "classification":
            out["accuracy"] = M.accuracy(trues, preds.argmax(-1))
            if cfg.auprc and preds.shape[-1] == 2:
                exp = np.exp(preds - preds.max(-1, keepdims=True))
                scores = (exp / exp.sum(-1, keepdims=True))[:, 1]
                out["auprc"] = M.auprc(scores, trues)
        elif cfg.task == "multilabel":
            hard = (1 / (1 + np.exp(-preds)) >= 0.5).astype(np.int64)
            out["f1_micro"] = M.f1_score(trues, hard, "micro")
            out["f1_macro"] = M.f1_score(trues, hard, "macro")
        elif cfg.task == "posneg-classification":
            acc, corr = M.posneg_accuracy_corr(trues, preds)
            out["accuracy"], out["corr"] = acc, corr
        if collect_weights:
            out["gate_stats"] = stats
        return out

    def _selection_metric(self, metrics: dict) -> float:
        """Higher is better."""
        task = self.cfg.task
        if task == "classification" or task == "posneg-classification":
            return metrics["accuracy"]
        if task == "multilabel":
            return metrics["f1_macro"]
        return -metrics["loss"]  # regression: lower val loss

    def fit(
        self,
        state,
        train_loader: ArrayLoader,
        valid_loader: ArrayLoader,
        rng=None,
        log_fn: Callable[[str], None] = print,
    ) -> tuple[dict, list[dict]]:
        """Full training run with early stopping; returns (best_state, logs)."""
        cfg = self.cfg
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        best_state = state
        best_metric = -np.inf
        patience = 0
        logs = []
        for epoch in range(cfg.epochs):
            rng, sub = jax.random.split(rng)
            state, train_loss = self.train_epoch(state, train_loader, sub)
            metrics = self.evaluate(state, valid_loader)
            sel = self._selection_metric(metrics)
            record = {"epoch": epoch, "train_loss": train_loss, **{
                k: v for k, v in metrics.items() if not isinstance(v, GateStats)
            }}
            logs.append(record)
            if sel > best_metric:
                best_metric = sel
                best_state = jax.tree_util.tree_map(lambda x: x, state)
                patience = 0
                log_fn(f"epoch {epoch}: {record} (new best)")
            else:
                patience += 1
                log_fn(f"epoch {epoch}: {record} (patience {patience})")
            if cfg.early_stop and patience > cfg.patience:
                break
        return best_state, logs
