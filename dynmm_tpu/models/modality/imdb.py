"""MM-IMDB modality-level DynMM: 2-branch sample-wise router
(reference ``ModalityDynMM/multimedia/imdb_dyn.py:29-114``).

Branch 1 = text expert (``MLP(300,512,512)`` encoder + ``MLP(512,512,23)``
head, imdb_uni.py:33-34); branch 2 (image-only) exists but is off the routing
path (imdb_dyn.py:39-41 "discard this branch due to poor performance");
branch 3 = image+text late fusion ``MMDL([MaxOut_MLP(512,512,300,·,False),
MaxOut_MLP(512,1024,4096,512,False)], Concat, Linear(1024,23))``
(imdb_dyn.py:47-50). Gate = ``MLP(4396,128,2)`` over concat(text 300-d,
image 4096-d VGG features) (imdb_dyn.py:60).

Forward returns ``(logits, resource, weight)`` where resource =
``weight[:, 1].mean()`` — the expensive-branch usage that the λ-weighted
loss regularizes (imdb_dyn.py:100-101) — and ``weight`` feeds ``GateStats``.

Both branches are always computed in soft/dense mode (training); hard
inference at batch=1 can route with ``forward_switch`` for real compute
skipping (TPU ``lax.switch``), though at MM-IMDB's model sizes the dense pass
is already tiny.

Per-branch MAC table (thop-derived constant, imdb_dyn.py:66):
``IMDB_FLOPS_M = [1.25261, 10.86908]`` M-MACs.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dynmm_tpu.core.gates import diff_softmax
from dynmm_tpu.core.routing import compact_two_branch
from dynmm_tpu.models.modality.mmdl import MMDL
from dynmm_tpu.nn.fusions import Concat
from dynmm_tpu.nn.mlp import MLP, LinearHead, MaxOut_MLP

IMDB_FLOPS_M = np.array([1.25261, 10.86908])
NUM_CLASSES = 23


class IMDBDynMMNet(nn.Module):
    """2-branch router over precomputed IMDB features (text 300-d, image 4096-d)."""

    branch_num: int = 2
    num_classes: int = NUM_CLASSES
    dropout_rate: float = 0.3  # MaxOut_MLP default; 0.0 for deterministic parity

    def setup(self):
        self.text_encoder = MLP(512, 512, name="text_encoder")
        self.text_head = MLP(512, self.num_classes, name="text_head")
        # image-only branch: present for checkpoint parity, not routed
        self.image_encoder = MLP(1024, 512, name="image_encoder")
        self.image_head = MLP(512, self.num_classes, name="image_head")
        self.branch3 = MMDL(
            encoders=[
                MaxOut_MLP(512, first_hidden=512, linear_layer=False,
                           dropout_rate=self.dropout_rate),
                MaxOut_MLP(512, first_hidden=1024, second_hidden=512,
                           linear_layer=False,
                           dropout_rate=self.dropout_rate),
            ],
            fusion=Concat(),
            head=LinearHead(self.num_classes),
            name="branch3",
        )
        self.gate = MLP(128, self.branch_num, name="gate")

    def init_all(self, inputs):
        """Init helper touching every submodule (the off-routing image branch is
        not reached by ``__call__``): use
        ``model.init(rng, inputs, method=model.init_all)`` when the image
        branch params must exist (checkpoint import, count_flop)."""
        out = self(inputs)
        _ = self.forward_branch(inputs, 2)
        return out

    def gate_weights(self, inputs, temp: float = 1.0, hard: bool = True,
                     train: bool = False):
        x = jnp.concatenate([i.reshape(i.shape[0], -1) for i in inputs], axis=1)
        return diff_softmax(self.gate(x, train=train), tau=temp, hard=hard)

    def __call__(
        self,
        inputs,
        temp: float = 1.0,
        hard: bool = True,
        infer_mode: int = 0,
        train: bool = False,
    ):
        """inputs = (text (B,300), image (B,4096)). Returns
        (logits, resource, weight)."""
        weight = self.gate_weights(inputs, temp=temp, hard=hard, train=train)
        preds = [
            self.text_head(self.text_encoder(inputs[0], train=train), train=train),
            self.branch3(inputs, train=train),
        ]
        if infer_mode > 0:
            return preds[infer_mode - 1], jnp.zeros(()), weight
        out = weight[:, 0:1] * preds[0] + weight[:, 1:2] * preds[1]
        return out, weight[:, 1].mean(), weight

    def forward_branch(self, inputs, path: int, train: bool = False):
        """Run a single branch (the reference's ``forward_separate_branch``,
        imdb_dyn.py:103-114): 1 = text, 2 = image, else late fusion."""
        if path == 1:
            return self.text_head(self.text_encoder(inputs[0], train=train), train=train)
        if path == 2:
            return self.image_head(self.image_encoder(inputs[1], train=train), train=train)
        return self.branch3(inputs, train=train)

    def forward_routed_compact(self, inputs, temp: float = 1.0, caps=None,
                               force_k=None):
        """Batched hard-routed inference with per-sample bucket compaction
        (``dynmm_tpu.core.routing``): the late-fusion branch runs only on a
        static-capacity prefix of the gate-sorted batch, the text expert on
        the complementary suffix. Per-sample results equal dense hard eval;
        compute approaches the 10.87/1.25 ≈ 8.7× branch MAC ratio
        (IMDB_FLOPS_M) as the gate routes text-only. ``force_k``: (B,)
        branch override (benchmarks/tests). Returns (logits, weight)."""
        weight = self.gate_weights(inputs, temp=temp, hard=True)
        k = (jnp.asarray(force_k, jnp.int32) if force_k is not None
             else jnp.argmax(weight, axis=-1).astype(jnp.int32))

        def cheap(ins):
            return self.text_head(self.text_encoder(ins[0]))

        def expensive(ins):
            return self.branch3(ins)

        out = compact_two_branch(
            k, tuple(inputs), cheap, expensive,
            out_shape=(self.num_classes,), caps=caps,
        )
        return out, weight

    def forward_switch(self, inputs, temp: float = 1.0):
        """Hard-routed batch=1 inference: only the selected branch executes
        (``lax.switch`` over the two routed branches)."""
        weight = self.gate_weights(inputs, temp=temp, hard=True)
        k = jnp.argmax(weight[0]).astype(jnp.int32)

        def text_path(operands):
            return self.text_head(self.text_encoder(operands[0]))

        def fusion_path(operands):
            return self.branch3(operands)

        out = jax.lax.switch(k, [text_path, fusion_path], tuple(inputs))
        return out, weight
