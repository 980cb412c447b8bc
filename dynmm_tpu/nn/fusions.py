"""Multimodal fusion modules — equivalents of MultiBench's
``fusions.common_fusions`` (Concat, ConcatEarly, LowRankTensorFusion,
MultiplicativeInteractions2Modal) used by the reference's expert builders
(``ModalityDynMM/multimedia/imdb_mm.py:25-53``, ``affect/affect_mm.py:17-126``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class Concat(nn.Module):
    """Late fusion: concatenate modality representations on the feature axis."""

    @nn.compact
    def __call__(self, modalities: Sequence[jax.Array]):
        return jnp.concatenate(
            [m.reshape(m.shape[0], -1) for m in modalities], axis=-1
        )


class ConcatEarly(nn.Module):
    """Early fusion: concatenate raw modality streams on the last axis
    (sequences stay (batch, time, Σ feat))."""

    @nn.compact
    def __call__(self, modalities: Sequence[jax.Array]):
        return jnp.concatenate(modalities, axis=-1)


class LowRankTensorFusion(nn.Module):
    """Low-rank multimodal tensor fusion (Liu et al. 2018).

    Each modality vector is 1-appended and projected by a rank-R factor stack;
    the fused vector is the elementwise product of per-modality projections
    summed over the rank with learned rank weights. All factor contractions
    are batched matmuls — one MXU pass per modality.
    """

    output_dim: int
    rank: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, modalities: Sequence[jax.Array]):
        batch = modalities[0].shape[0]
        fused = None
        for i, m in enumerate(modalities):
            m = m.reshape(batch, -1)
            ones = jnp.ones((batch, 1), dtype=m.dtype)
            m1 = jnp.concatenate([m, ones], axis=-1)  # (B, d+1)
            factor = self.param(
                f"factor{i}",
                nn.initializers.normal(stddev=0.02),
                (self.rank, m1.shape[-1], self.output_dim),
            )
            # (B, d+1) x (R, d+1, out) -> (R, B, out)
            proj = jnp.einsum("bd,rdo->rbo", m1, factor.astype(m1.dtype))
            fused = proj if fused is None else fused * proj
        rank_w = self.param(
            "rank_weights", nn.initializers.normal(stddev=0.02), (1, self.rank)
        )
        bias = self.param("bias", nn.initializers.zeros, (1, self.output_dim))
        out = jnp.einsum("rbo,r->bo", fused, rank_w[0].astype(fused.dtype))
        return out + bias.astype(out.dtype)


class MultiplicativeInteractions2Modal(nn.Module):
    """Bilinear ('matrix') multiplicative interaction of two modalities:
    ``out = x1 · (W ⋅ x2 + U) + (V ⋅ x2 + b)`` with a low-cost einsum layout.

    Equivalent of MultiBench's ``MultiplicativeInteractions2Modal(
    [d1, d2], output_dim, 'matrix')`` used by the ``mim`` IMDB expert
    (``imdb_mm.py:45-47``).
    """

    output_dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, modalities: Sequence[jax.Array]):
        x1 = modalities[0].reshape(modalities[0].shape[0], -1)
        x2 = modalities[1].reshape(modalities[1].shape[0], -1)
        d1, d2 = x1.shape[-1], x2.shape[-1]
        W = self.param(
            "W", nn.initializers.normal(stddev=0.01), (d2, d1, self.output_dim)
        )
        U = self.param("U", nn.initializers.zeros, (d1, self.output_dim))
        V = self.param("V", nn.initializers.normal(stddev=0.01), (d2, self.output_dim))
        b = self.param("b", nn.initializers.zeros, (self.output_dim,))
        # gate matrix generated from x2, applied to x1
        Wx2 = jnp.einsum("bd,dio->bio", x2, W.astype(x2.dtype))  # (B, d1, out)
        out = jnp.einsum("bi,bio->bo", x1, Wx2 + U.astype(x1.dtype)[None])
        out = out + x2 @ V.astype(x2.dtype) + b.astype(out.dtype)
        return out
