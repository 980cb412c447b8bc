"""Post-training int8 quantization for the serving path.

The flagship is HBM-bound at every stage (docs/DESIGN.md roofline: dense
bf16 runs at ~1.06x its byte floor), so the remaining serving-throughput
lever is cutting the bytes themselves: int8 activations+weights halve the
conv-adjacent traffic vs bf16, and the v5e MXU runs int8 at 2x the bf16
rate. The reference has no quantized path (it serves fp32 torch); this is
a TPU-native extension, default-off, scored for accuracy like every other
serving knob (``eval.py --quant int8``).

Design (consumer-side activation quantization, zero-point-free symmetric):

* ``QConv`` is an ``nn.Conv``-compatible conv whose variable layout is
  IDENTICAL to ``nn.Conv`` (params ``kernel``/``bias`` in its own scope) so
  float-trained checkpoints load unchanged into quantized models.
* ``quant=None``   -> plain float conv (handled by the callers, which keep
  using ``nn.Conv`` — zero behavioral change to existing configs).
* ``quant='calib'``-> float conv, plus a running abs-max of the conv INPUT
  into the mutable ``quant`` collection (``in_scale``); drive it with
  ``utils.quantize.calibrate``.
* ``quant='int8'`` -> ``x_q = round(clip(x/s_in)) : int8``;
  ``w_q = round(w/s_w) : int8`` with per-output-channel ``s_w`` computed
  in-graph from the float kernel (weights are ~1-2% of the activation
  traffic, so re-quantizing per call is free and keeps the checkpoint
  float);
  ``y = conv(x_q, w_q, preferred_element_type=int32) * (s_in*s_w) + b``.

Between convs everything stays float (BN/act/SE/residual algebra is
untouched): XLA fuses the dequant -> BN -> act -> next-layer-quantize chain
into the producer conv's epilogue, so the tensor that actually lands in HBM
between two quantized convs is the int8 one (verified on-chip by
tools/perf_int8.py's requant-chain candidates). Symmetric quantization
keeps zero exact, so SAME-padding zeros are exact.

Grouped convs (``feature_group_count > 1``, e.g. the learned-3x3 depthwise
upsample) fall back to float — their traffic is small and per-group scale
bookkeeping isn't worth it.
"""

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Collection name for calibrated activation scales.
QUANT_COLL = "quant"

# Percentiles recorded during calibration alongside the abs-max (one
# sort, three quantile picks — the TensorRT-style clipped estimators).
# ``utils.quantize.select_scales`` swaps one of these into ``in_scale``
# when the CLI asks for ``--calib_estimator percentile``; recording a
# fixed grid keeps QConv config-free (no per-conv percentile plumbing).
CALIB_PERCENTILES = (99.0, 99.9, 99.99)


def weight_scales(kernel: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Per-output-channel symmetric scales for an HWIO kernel: (C_out,)."""
    s = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=(0, 1, 2)) / 127.0
    return jnp.maximum(s, eps)


def quantize_symmetric(x: jax.Array, scale: jax.Array) -> jax.Array:
    """round(clip(x/scale, ±127)) as int8 (scale broadcasts)."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


class QConv(nn.Module):
    """``nn.Conv``-layout conv with calib/int8 modes (see module docstring).

    Only instantiated when ``quant`` is 'calib' or 'int8'; float configs
    keep using ``nn.Conv`` so their graph is byte-for-byte unchanged.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Union[str, Sequence] = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1
    kernel_dilation: Sequence[int] = (1, 1)
    dtype: Optional[Dtype] = None
    quant: str = "calib"

    @nn.compact
    def __call__(self, x):
        assert self.quant in ("calib", "int8"), self.quant
        cin = x.shape[-1] // self.feature_group_count
        kshape = (*self.kernel_size, cin, self.features)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), kshape, jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kshape, ("NHWC", "HWIO", "NHWC"))

        quantizable = self.feature_group_count == 1
        s_in = None
        if quantizable:
            s_in = self.variable(
                QUANT_COLL, "in_scale",
                lambda: jnp.zeros((), jnp.float32))

        out_dtype = self.dtype or jnp.promote_types(
            x.dtype if x.dtype != jnp.int8 else jnp.float32, jnp.float32)

        if self.quant == "int8" and quantizable:
            scale = jnp.maximum(s_in.value, 1e-12)
            x_q = quantize_symmetric(x, scale)
            if kernel.dtype == jnp.int8:
                # pre-packed weights (utils.quantize.pack_weights): the
                # kernel leaf already holds w_q and the per-channel scale
                # lives in the quant collection — no per-call re-quantize
                # (the in-graph form re-read every f32 kernel each call,
                # ~1.1 ms/call on the flagship)
                w_q = kernel
                s_w = self.variable(
                    QUANT_COLL, "w_scale",
                    lambda: jnp.zeros((self.features,), jnp.float32)).value
            else:
                s_w = weight_scales(kernel)
                w_q = quantize_symmetric(kernel, s_w[None, None, None, :])
            acc = jax.lax.conv_general_dilated(
                x_q, w_q,
                window_strides=tuple(self.strides),
                padding=self.padding,
                rhs_dilation=tuple(self.kernel_dilation),
                dimension_numbers=dn,
                feature_group_count=self.feature_group_count,
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * (scale * s_w)
            if bias is not None:
                y = y + bias
            return y.astype(out_dtype)

        # float path ('calib', or grouped-conv fallback in 'int8')
        if self.quant == "calib" and quantizable:
            # abs-max AND the percentile grid, both as running maxes over
            # batches (max-of-per-batch-quantiles upper-bounds the pooled
            # quantile slightly; documented in utils/quantize.py). int8
            # mode never reads in_pct — select_scales() resolves the
            # chosen estimator into in_scale before serving.
            s_pct = self.variable(
                QUANT_COLL, "in_pct",
                lambda: jnp.zeros((len(CALIB_PERCENTILES),), jnp.float32))
            if not self.is_initializing():
                ax = jnp.abs(x.astype(jnp.float32)).reshape(-1)
                s_in.value = jnp.maximum(s_in.value, jnp.max(ax) / 127.0)
                qs = jnp.quantile(
                    ax, jnp.asarray(CALIB_PERCENTILES) / 100.0)
                s_pct.value = jnp.maximum(s_pct.value, qs / 127.0)
        cd = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(cd), kernel.astype(cd),
            window_strides=tuple(self.strides),
            padding=self.padding,
            rhs_dilation=tuple(self.kernel_dilation),
            dimension_numbers=dn,
            feature_group_count=self.feature_group_count,
        )
        if bias is not None:
            y = y + bias.astype(cd)
        return y.astype(out_dtype)
