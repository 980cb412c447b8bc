"""CMU-MOSEI modality-level DynMM routers
(reference ``ModalityDynMM/affect/affect_dyn.py``).

``MoseiDynMMNetV2`` (the paper's model, affect_dyn.py:107-175): 2-branch
router — branch 1 = text transformer expert (``Transformer(300,120)`` +
``MLP(120,64,1)`` head, per affect_uni.py:60,71-73), branch 2 = tri-modal
late-fusion transformer expert (``Transformer(35,60)/(74,120)/(300,120)`` +
Concat + ``MLP(300,128,1)``, per affect_mm.py:61-66). Gate =
``Transformer(409,10) → Linear(10,2)`` over the early-concat of all three
modality streams (affect_dyn.py:120).

``MoseiTriBranchDynMMNet`` (affect_dyn.py:31-104): 3-branch variant with one
unimodal expert per modality, soft-combined by a 3-way gate.

Packed sequences become fixed-shape (batch, time, feat) tensors + explicit
``lengths`` — see ``dynmm_tpu.nn.sequence``.

Per-branch MAC table (thop-derived, affect_dyn.py:126):
``MOSEI_FLOPS_M = [135.13226, 320.03205]`` M-MACs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dynmm_tpu.core.gates import diff_softmax
from dynmm_tpu.core.routing import compact_two_branch
from dynmm_tpu.models.modality.mmdl import MMDL
from dynmm_tpu.nn.fusions import Concat
from dynmm_tpu.nn.mlp import MLP
from dynmm_tpu.nn.sequence import Transformer

MOSEI_FLOPS_M = np.array([135.13226, 320.03205])

# modality order in the MOSEI data tuples: (visual 35-d, audio 74-d, text 300-d)
VISUAL_DIM, AUDIO_DIM, TEXT_DIM = 35, 74, 300


class _GateTransformer(nn.Module):
    """Transformer(409, 10) → Linear(10, branch_num) (affect_dyn.py:120)."""

    branch_num: int

    @nn.compact
    def __call__(self, x, lengths=None, train: bool = False):
        h = Transformer(dim=10, name="encoder")(x, lengths, train)
        return nn.Dense(self.branch_num, name="fc")(h)


class MoseiDynMMNetV2(nn.Module):
    """2-branch CMU-MOSEI router (text expert vs tri-modal late fusion)."""

    branch_num: int = 2

    def setup(self):
        self.text_encoder = Transformer(dim=120, name="text_encoder")
        self.text_head = MLP(64, 1, name="text_head")
        self.branch2 = MMDL(
            encoders=[
                Transformer(dim=60),
                Transformer(dim=120),
                Transformer(dim=120),
            ],
            fusion=Concat(),
            head=MLP(128, 1),
            has_padding=True,
            name="branch2",
        )
        self.gate = _GateTransformer(self.branch_num, name="gate")

    def gate_weights(
        self, inputs, lengths, temp: float = 1.0, hard: bool = False,
        train: bool = False,
    ):
        x = jnp.concatenate(inputs, axis=2)  # (B, T, 409)
        logits = self.gate(x, lengths[0] if lengths else None, train)
        return diff_softmax(logits, tau=temp, hard=hard)

    def __call__(
        self,
        inputs: Sequence[jax.Array],
        lengths: Optional[Sequence[jax.Array]] = None,
        temp: float = 1.0,
        hard: bool = False,
        infer_mode: int = 0,
        train: bool = False,
    ):
        """inputs = (visual (B,T,35), audio (B,T,74), text (B,T,300)).
        Returns (pred, resource, weight); resource = weight[:, 1].mean()."""
        weight = self.gate_weights(inputs, lengths, temp=temp, hard=hard, train=train)
        text_len = lengths[2] if lengths else None
        preds = [
            self.text_head(self.text_encoder(inputs[2], text_len, train), train=train),
            self.branch2(inputs, lengths, train=train),
        ]
        if infer_mode > 0:
            return preds[infer_mode - 1], jnp.zeros(()), weight
        if infer_mode == -1:  # uniform-weight ablation (affect_dyn.py:161-162)
            weight = jnp.ones_like(weight) / self.branch_num
        out = weight[:, 0:1] * preds[0] + weight[:, 1:2] * preds[1]
        return out, weight[:, 1].mean(), weight

    def forward_routed_compact(
        self,
        inputs: Sequence[jax.Array],
        lengths: Optional[Sequence[jax.Array]] = None,
        temp: float = 1.0,
        caps=None,
        force_k=None,
    ):
        """Batched hard-routed inference with per-sample bucket compaction:
        the batch is sorted by gate decision so the expensive tri-modal
        expert runs only on a static-capacity prefix and the text expert on
        the complementary suffix (``dynmm_tpu.core.routing``). Per-sample
        results equal dense hard eval; compute drops toward the per-branch
        MAC ratio (320/135 ≈ 2.4× — MOSEI_FLOPS_M) as the gate routes more
        samples to the text expert. ``force_k``: (B,) branch override
        (benchmarks/tests — measures exact path mixtures). Returns
        (pred (B,1), weight (B,2))."""
        weight = self.gate_weights(inputs, lengths, temp=temp, hard=True)
        k = (jnp.asarray(force_k, jnp.int32) if force_k is not None
             else jnp.argmax(weight, axis=-1).astype(jnp.int32))
        tree = (tuple(inputs), tuple(lengths) if lengths is not None else None)

        def cheap(ops):
            ins, lens = ops
            tl = lens[2] if lens is not None else None
            return self.text_head(self.text_encoder(ins[2], tl))

        def expensive(ops):
            ins, lens = ops
            return self.branch2(ins, lens)

        out = compact_two_branch(
            k, tree, cheap, expensive, out_shape=(1,), caps=caps
        )
        return out, weight

    def forward_switch(self, inputs, lengths=None, temp: float = 1.0):
        """Hard-routed batch=1 inference via lax.switch — only the selected
        expert executes."""
        weight = self.gate_weights(inputs, lengths, temp=temp, hard=True)
        k = jnp.argmax(weight[0]).astype(jnp.int32)
        text_len = lengths[2] if lengths else None

        def text_path(_):
            return self.text_head(self.text_encoder(inputs[2], text_len))

        def fusion_path(_):
            return self.branch2(inputs, lengths)

        out = jax.lax.switch(k, [text_path, fusion_path], ())
        return out, weight


class MoseiTriBranchDynMMNet(nn.Module):
    """3-branch variant: one unimodal expert per modality
    (affect_dyn.py:31-104). Encoder dims follow affect_uni.py's transformer
    settings (120 hidden for each modality)."""

    branch_num: int = 3

    def setup(self):
        self.encoders = [
            Transformer(dim=120, name="encoder_visual"),
            Transformer(dim=120, name="encoder_audio"),
            Transformer(dim=120, name="encoder_text"),
        ]
        self.heads = [
            MLP(64, 1, name="head_visual"),
            MLP(64, 1, name="head_audio"),
            MLP(64, 1, name="head_text"),
        ]
        self.gate = _GateTransformer(self.branch_num, name="gate")

    def __call__(
        self,
        inputs: Sequence[jax.Array],
        lengths: Optional[Sequence[jax.Array]] = None,
        temp: float = 1.0,
        hard: bool = False,
        infer_mode: int = 0,
        train: bool = False,
    ):
        x = jnp.concatenate(inputs, axis=2)
        logits = self.gate(x, lengths[0] if lengths else None, train)
        weight = diff_softmax(logits, tau=temp, hard=hard)

        preds = []
        for i in range(3):
            li = lengths[i] if lengths else None
            mid = self.encoders[i](inputs[i], li, train)
            preds.append(self.heads[i](mid, train=train))

        if infer_mode > 0:
            return preds[infer_mode - 1], jnp.zeros(()), weight
        if infer_mode == -1:
            weight = jnp.ones_like(weight) / self.branch_num
        out = sum(weight[:, i : i + 1] * preds[i] for i in range(3))
        return out, weight[:, 2].mean(), weight
