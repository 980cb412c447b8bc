"""MULT — Multimodal Transformer with cross-modal attention (Tsai et al.
2019), the reference's expert variant 4 (``affect_mm.py:68-86`` instantiates
``fusions.mult.MULTModel(3, [35, 74, 300], HParams)`` with embed_dim 40,
10 heads, 4 layers, output_dim 1).

Structure (TPU re-design, masked static-shape attention throughout):
per-modality kernel-1 projections to ``embed_dim`` → for every target
modality i, cross-modal transformer streams attending from i's queries to
each other modality j's keys/values → concat the two cross streams →
self-attention transformer → last valid timestep → concat the three target
summaries → residual MLP head.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynmm_tpu.nn.sequence import last_valid, length_mask, sinusoidal_positions

Dtype = Any


class CrossModalLayer(nn.Module):
    """Pre-norm cross-attention block: target queries attend to source k/v."""

    dim: int
    num_heads: int
    dropout_rate: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, target, source, source_mask=None, train: bool = False):
        attn_mask = None
        if source_mask is not None:
            attn_mask = source_mask[:, None, None, :]
        q = nn.LayerNorm(dtype=self.dtype, name="ln_q")(target)
        kv = nn.LayerNorm(dtype=self.dtype, name="ln_kv")(source)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.dim,
            dropout_rate=self.dropout_rate,
            deterministic=not train,
            dtype=self.dtype,
            name="attn",
        )(q, kv, mask=attn_mask)
        x = target + y
        y = nn.LayerNorm(dtype=self.dtype, name="ln_ffn")(x)
        y = nn.Dense(self.dim * 4, dtype=self.dtype, name="ffn1")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="ffn2")(y)
        return x + y


class CrossModalTransformer(nn.Module):
    dim: int
    num_heads: int
    layers: int
    dropout_rate: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, target, source, source_mask=None, train: bool = False):
        h = target
        for i in range(self.layers):
            h = CrossModalLayer(
                self.dim, self.num_heads, self.dropout_rate, self.dtype,
                name=f"layer{i}",
            )(h, source, source_mask, train)
        return h


class MULTModel(nn.Module):
    """3-modality MULT fusion head: sequences in, (batch, output_dim) out."""

    embed_dim: int = 40
    num_heads: int = 10
    layers: int = 4
    output_dim: int = 1
    dropout_rate: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, modalities: Sequence[jax.Array], lengths=None,
                 train: bool = False):
        n_mod = len(modalities)
        time = modalities[0].shape[1]
        masks = []
        for i, m in enumerate(modalities):
            if lengths is not None:
                masks.append(length_mask(lengths[i], m.shape[1]))
            else:
                masks.append(None)

        # kernel-1 projections + positions
        streams = []
        for i, m in enumerate(modalities):
            h = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                         name=f"proj{i}")(m)
            h = h + sinusoidal_positions(m.shape[1], self.embed_dim,
                                         dtype=h.dtype)[None]
            streams.append(h)

        summaries = []
        for i in range(n_mod):
            crossed = []
            for j in range(n_mod):
                if i == j:
                    continue
                crossed.append(
                    CrossModalTransformer(
                        self.embed_dim, self.num_heads, self.layers,
                        self.dropout_rate, self.dtype,
                        name=f"cross_{i}_{j}",
                    )(streams[i], streams[j], masks[j], train)
                )
            h = jnp.concatenate(crossed, axis=-1)  # (B, T, 2*embed)
            h = CrossModalTransformer(
                h.shape[-1], self.num_heads, max(self.layers // 2, 1),
                self.dropout_rate, self.dtype, name=f"self_{i}",
            )(h, h, masks[i], train)
            if lengths is not None:
                summaries.append(last_valid(h, lengths[i]))
            else:
                summaries.append(h[:, -1])

        fused = jnp.concatenate(summaries, axis=-1)
        y = nn.Dense(fused.shape[-1], dtype=self.dtype, name="out_proj1")(fused)
        y = jax.nn.relu(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = nn.Dense(fused.shape[-1], dtype=self.dtype, name="out_proj2")(y)
        fused = fused + y
        return nn.Dense(self.output_dim, dtype=self.dtype, name="out_layer")(fused)
