"""Context modules: Pyramid Pooling (PPM) and adaptive variant (APPM).

Reference: ``FusionDynMM/src/models/context_modules.py:16-136``. Default ESANet
config uses ``ppm`` with bins (1, 5) on the 1/32 feature map (15×20 for
480×640 inputs).

``adaptive_avg_pool2d`` reproduces torch's variable-window semantics exactly
(start = floor(i·H/oh), end = ceil((i+1)·H/oh)); output cells are a small
static unrolled set, which XLA folds into a handful of fused reductions.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynmm_tpu.nn.layers import ConvBNAct, resize_bilinear, resize_nearest

Dtype = Any


def adaptive_avg_pool2d(x: jax.Array, output_size: tuple[int, int]) -> jax.Array:
    """torch-semantics adaptive average pooling over NHWC spatial dims."""
    n, h, w, c = x.shape
    oh, ow = output_size
    if h % oh == 0 and w % ow == 0:
        # fast path: equal windows → single reshape-mean
        return x.reshape(n, oh, h // oh, ow, w // ow, c).mean(axis=(2, 4))
    rows = []
    for i in range(oh):
        h0, h1 = (i * h) // oh, math.ceil((i + 1) * h / oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * w) // ow, math.ceil((j + 1) * w / ow)
            cols.append(x[:, h0:h1, w0:w1, :].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


def _upsample_to(y: jax.Array, hw: tuple[int, int], mode: str) -> jax.Array:
    if mode == "nearest":
        return resize_nearest(y, hw)
    if mode == "bilinear":
        return resize_bilinear(y, hw)
    raise NotImplementedError(
        "For the PyramidPoolingModule only nearest and bilinear interpolation "
        f"are supported. Got: {mode}"
    )


class PyramidPoolingModule(nn.Module):
    """PSPNet-style pyramid pooling: per-bin adaptive pool → 1×1 ConvBNAct
    (in → in/len(bins)) → upsample back → concat with input → 1×1 ConvBNAct.
    """

    out_dim: int
    bins: Sequence[int] = (1, 5)
    activation: Callable = jax.nn.relu
    upsampling_mode: str = "nearest"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dim = x.shape[-1]
        reduction_dim = in_dim // len(self.bins)
        h, w = x.shape[1], x.shape[2]
        out = [x]
        for i, b in enumerate(self.bins):
            y = adaptive_avg_pool2d(x, (b, b))
            y = ConvBNAct(
                reduction_dim, 1, activation=self.activation, dtype=self.dtype,
                name=f"feature{i}",
            )(y, train)
            out.append(_upsample_to(y, (h, w), self.upsampling_mode))
        y = jnp.concatenate(out, axis=-1)
        return ConvBNAct(
            self.out_dim, 1, activation=self.activation, dtype=self.dtype,
            name="final_conv",
        )(y, train)


class AdaptivePyramidPoolingModule(nn.Module):
    """Input-size-relative PPM: bin sizes scale with input/nominal-size ratio
    (context_modules.py:90-136) so the module generalizes across resolutions.
    """

    out_dim: int
    input_size: tuple[int, int]
    bins: Sequence[int] = (1, 5)
    activation: Callable = jax.nn.relu
    upsampling_mode: str = "nearest"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dim = x.shape[-1]
        reduction_dim = in_dim // len(self.bins)
        h, w = x.shape[1], x.shape[2]
        h_inp, w_inp = self.input_size
        mult_h = int(h / h_inp + 0.5)
        mult_w = int(w / w_inp + 0.5)
        out = [x]
        for i, b in enumerate(self.bins):
            y = adaptive_avg_pool2d(x, (b * mult_h, b * mult_w))
            y = ConvBNAct(
                reduction_dim, 1, activation=self.activation, dtype=self.dtype,
                name=f"feature{i}",
            )(y, train)
            out.append(_upsample_to(y, (h, w), self.upsampling_mode))
        y = jnp.concatenate(out, axis=-1)
        return ConvBNAct(
            self.out_dim, 1, activation=self.activation, dtype=self.dtype,
            name="final_conv",
        )(y, train)


def get_context_module(
    name: str,
    channels_in: int,
    channels_out: int,
    input_size: tuple[int, int],
    activation: Callable = jax.nn.relu,
    upsampling_mode: str = "bilinear",
    dtype: Optional[Dtype] = None,
    module_name: str = "context_module",
):
    """Selector mirroring ``get_context_module`` (context_modules.py:16-44).
    Returns (module_or_None, channels_after)."""
    bins = (1, 2, 4, 8) if name.endswith("1-2-4-8") else (1, 5)
    if "appm" in name:
        return (
            AdaptivePyramidPoolingModule(
                channels_out,
                input_size=input_size,
                bins=bins,
                activation=activation,
                upsampling_mode=upsampling_mode,
                dtype=dtype,
                name=module_name,
            ),
            channels_out,
        )
    if "ppm" in name:
        return (
            PyramidPoolingModule(
                channels_out,
                bins=bins,
                activation=activation,
                upsampling_mode=upsampling_mode,
                dtype=dtype,
                name=module_name,
            ),
            channels_out,
        )
    return None, channels_in
