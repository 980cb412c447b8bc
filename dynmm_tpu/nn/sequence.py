"""Sequence encoders: GRU and Transformer with explicit length masking.

Equivalents of MultiBench's ``unimodals.common_models.GRU / GRUWithLinear /
Transformer`` used by the reference's affect (CMU-MOSEI/MOSI) stack
(``ModalityDynMM/affect/affect_uni.py:38-60``, ``affect_mm.py:61-66``,
``affect_dyn.py:120``).

TPU-first redesign of the packed-sequence machinery: torch's
``pack_padded_sequence`` creates ragged batches, which XLA cannot compile.
Instead every sequence op here takes a fixed-shape (batch, time, feat) tensor
plus a ``lengths`` (batch,) int array; masking does the rest:

* GRU runs a ``lax.scan`` over time with a per-step valid mask so hidden
  states freeze after each sequence's end — numerically identical to packing.
* The transformer masks attention scores over padded keys and summarizes with
  the last *valid* timestep.

Static shapes + masks keep the whole model jittable and MXU-friendly.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def length_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(batch, max_len) boolean mask: True where t < length."""
    t = jnp.arange(max_len)[None, :]
    return t < lengths[:, None]


def last_valid(x: jax.Array, lengths: jax.Array) -> jax.Array:
    """Gather x[b, lengths[b]-1, :] for each batch element."""
    idx = jnp.clip(lengths - 1, 0, x.shape[1] - 1)
    return jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0, :]


class _MaskedGRUStep(nn.Module):
    """One masked GRU step: update the hidden state only where the step is
    valid, freezing it past each sequence's end (packed-sequence semantics)."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, h, xs):
        x_t, m_t = xs
        h_new, _ = nn.GRUCell(self.features, dtype=self.dtype, name="cell")(h, x_t)
        h = jnp.where(m_t[:, None], h_new, h)
        return h, h


class GRU(nn.Module):
    """Masked GRU encoder (MultiBench ``GRU(indim, hiddim, dropout,
    has_padding, flatten, last_only)`` contract).

    Returns the final valid hidden state when ``last_only`` (the affect
    experts' mode), the flattened full sequence when ``flatten``, else the
    full (batch, time, hid) sequence.
    """

    hidden_dim: int
    dropout: bool = False
    dropout_rate: float = 0.1
    flatten: bool = False
    last_only: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, lengths: Optional[jax.Array] = None, train: bool = False):
        batch, time, _ = x.shape
        h0 = jnp.zeros((batch, self.hidden_dim), dtype=x.dtype)

        if lengths is None:
            lengths = jnp.full((batch,), time, dtype=jnp.int32)
        mask = length_mask(lengths, time)  # (batch, time)

        scan = nn.scan(
            _MaskedGRUStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        h_last, h_seq = scan(self.hidden_dim, dtype=self.dtype, name="scan")(
            h0, (x, mask)
        )

        if self.dropout:
            h_last = nn.Dropout(self.dropout_rate, deterministic=not train)(h_last)
            h_seq = nn.Dropout(self.dropout_rate, deterministic=not train)(h_seq)
        if self.last_only:
            return h_last
        if self.flatten:
            return h_seq.reshape(batch, -1)
        return h_seq


class GRUWithLinear(nn.Module):
    """GRU followed by a linear projection (MultiBench ``GRUWithLinear``)."""

    hidden_dim: int
    out_dim: int
    dropout: bool = False
    dropout_rate: float = 0.1
    flatten: bool = False
    last_only: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, lengths: Optional[jax.Array] = None, train: bool = False):
        h = GRU(
            self.hidden_dim,
            dropout=self.dropout,
            dropout_rate=self.dropout_rate,
            flatten=self.flatten,
            last_only=self.last_only,
            dtype=self.dtype,
            name="gru",
        )(x, lengths, train)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="linear")(h)


def sinusoidal_positions(time: int, dim: int, dtype=jnp.float32) -> jax.Array:
    """Standard sinusoidal position embeddings, (time, dim)."""
    pos = jnp.arange(time, dtype=dtype)[:, None]
    half = (dim + 1) // 2
    freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half, dtype=dtype) / max(half, 1))
    angles = pos * freqs[None, :]
    pe = jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)
    return pe[:, :dim]


class TransformerEncoderLayer(nn.Module):
    """Pre-norm transformer encoder block with masked multi-head attention."""

    dim: int
    num_heads: int
    ffn_mult: int = 4
    dropout_rate: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        attn_mask = None
        if mask is not None:
            # (batch, 1, q, k): every query may attend to valid keys only
            attn_mask = mask[:, None, None, :]
        y = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.dim,
            dropout_rate=self.dropout_rate,
            deterministic=not train,
            dtype=self.dtype,
            name="attn",
        )(y, y, mask=attn_mask)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        y = nn.Dense(self.dim * self.ffn_mult, dtype=self.dtype, name="ffn1")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="ffn2")(y)
        return x + y


class Transformer(nn.Module):
    """Sequence-summary transformer (MultiBench ``Transformer(n_features, dim)``
    contract): project features to ``dim`` with a kernel-1 conv, add sinusoidal
    positions, run encoder layers, return a (batch, dim) summary.

    The reference's gate uses ``Transformer(409, 10)`` over the early-concat
    of all three MOSEI modality streams (``affect_dyn.py:120``). Padded steps
    are masked out of attention, and the summary is the last *valid* timestep.
    """

    dim: int
    num_layers: int = 3
    num_heads: int = 2
    dropout_rate: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, lengths: Optional[jax.Array] = None, train: bool = False):
        batch, time, _ = x.shape
        if lengths is None:
            lengths = jnp.full((batch,), time, dtype=jnp.int32)
        mask = length_mask(lengths, time)

        h = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="proj")(x)
        h = h + sinusoidal_positions(time, self.dim, dtype=h.dtype)[None]
        for i in range(self.num_layers):
            h = TransformerEncoderLayer(
                self.dim,
                self.num_heads,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                name=f"layer{i}",
            )(h, mask, train)
        h = nn.LayerNorm(dtype=self.dtype, name="ln_out")(h)
        return last_valid(h, lengths)
