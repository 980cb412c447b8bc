"""MLP-family encoders/heads — equivalents of the MultiBench modules the
reference imports (``unimodals.common_models``: MLP, MaxOut_MLP, Linear,
Identity; used at e.g. ``ModalityDynMM/multimedia/imdb_uni.py:32-37``,
``imdb_dyn.py:34-60``, ``imdb_mm.py:31-53``).

MultiBench is an *external* dependency of the reference (never vendored), so
these are fresh TPU-idiomatic implementations of the same call contracts:
``MLP(indim→hiddim→outdim)`` with ReLU and optional dropout, ``MaxOut_MLP``
with batch-normed maxout stacks, and a plain ``LinearHead``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax

from dynmm_tpu.nn.layers import TorchBatchNorm

Dtype = Any


class MLP(nn.Module):
    """Two-layer ReLU MLP: ``Linear(in, hid) → ReLU → [dropout] → Linear(hid, out)``.

    Matches the MultiBench ``MLP(indim, hiddim, outdim)`` contract used for
    the MM-IMDB experts (text ``MLP(300,512,512)`` + head ``MLP(512,512,23)``,
    image ``MLP(4096,1024,512)``; ``imdb_uni.py:32-37``) and the IMDB gate
    ``MLP(4396, 128, 2)`` (``imdb_dyn.py:60``).
    """

    hidden_dim: int
    out_dim: int
    dropout: bool = False
    dropout_rate: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.relu(x)
        if self.dropout:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class Maxout(nn.Module):
    """Maxout layer: ``max_k (x W_k + b_k)`` over ``num_pieces`` linear maps.

    Implemented as one batched matmul reshaped to (..., out, k) then a max —
    a single MXU pass instead of k small ones.
    """

    out_dim: int
    num_pieces: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.out_dim * self.num_pieces, dtype=self.dtype, name="lin")(x)
        y = y.reshape(*y.shape[:-1], self.out_dim, self.num_pieces)
        return y.max(axis=-1)


class MaxOut_MLP(nn.Module):
    """Batch-normed maxout MLP matching MultiBench's ``MaxOut_MLP`` contract:
    ``BN(in) → Maxout(in, h1) → BN(h1, affine-free) → Maxout(h1, h2)
    [→ Linear(h2, out)]``.

    Used for the MM-IMDB late-fusion experts:
    ``MaxOut_MLP(512, 512, 300, linear_layer=False)`` (text) and
    ``MaxOut_MLP(512, 1024, 4096, 512, False)`` (image) (``imdb_dyn.py:47``).
    """

    num_outputs: int
    first_hidden: int = 64
    second_hidden: Optional[int] = None
    linear_layer: bool = True
    dropout_rate: float = 0.3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        second_hidden = (
            self.second_hidden if self.second_hidden is not None else self.first_hidden
        )
        x = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn0",
            dtype=self.dtype,
        )(x)
        x = Maxout(self.first_hidden, 2, dtype=self.dtype, name="max1")(x)
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            use_bias=False,
            use_scale=False,
            name="bn1",
            dtype=self.dtype,
        )(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = Maxout(second_hidden, 2, dtype=self.dtype, name="max2")(x)
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            use_bias=False,
            use_scale=False,
            name="bn2",
            dtype=self.dtype,
        )(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        if self.linear_layer:
            x = nn.Dense(self.num_outputs, dtype=self.dtype, name="out")(x)
        return x


class LinearHead(nn.Module):
    """Plain linear head (MultiBench ``Linear(indim, outdim)``, e.g. the
    late-fusion IMDB head ``Linear(1024, 23)`` at ``imdb_dyn.py:48``)."""

    out_dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc")(x)


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return x
