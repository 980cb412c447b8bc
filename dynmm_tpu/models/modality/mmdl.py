"""MMDL — generic multimodal supervised model: per-modality encoders → fusion
→ head (reference ``ModalityDynMM/training_structures/Supervised_Learning.py:16-51``).

The torch version dispatches on "packed" (padded-sequence) inputs; here the
equivalent is an optional ``lengths`` list of (batch,) int arrays passed to
sequence encoders, keeping every shape static for XLA.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax


class EncoderHead(nn.Module):
    """Unimodal encoder + head pipeline (the reference trains these via
    ``training_structures.unimodal.train`` for the expert branches)."""

    encoder: nn.Module
    head: nn.Module
    sequence: bool = False

    def __call__(self, x, lengths=None, train: bool = False):
        if self.sequence:
            h = self.encoder(x, lengths, train)
        else:
            h = self.encoder(x, train=train)
        return self.head(h, train=train)


class MMDL(nn.Module):
    """encoders[i](inputs[i]) → fusion(outs) → head."""

    encoders: Sequence[nn.Module]
    fusion: nn.Module
    head: nn.Module
    has_padding: bool = False

    def __call__(
        self,
        inputs: Sequence[jax.Array],
        lengths: Optional[Sequence[jax.Array]] = None,
        train: bool = False,
    ):
        outs = []
        for i, enc in enumerate(self.encoders):
            if self.has_padding:
                outs.append(
                    enc(inputs[i], lengths[i] if lengths else None, train)
                )
            else:
                outs.append(enc(inputs[i], train=train))
        fused = self.fusion(outs)
        if isinstance(fused, tuple):
            fused = fused[0]
        out = self.head(fused, train=train)
        if isinstance(out, (list, tuple)):
            out = out[0]
        return out
