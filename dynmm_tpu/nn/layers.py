"""Conv / norm / squeeze-excite building blocks (NHWC, flax.linen).

TPU-first design notes
----------------------
* All image tensors are NHWC — the native layout for TPU convolutions (the
  reference uses NCHW torch tensors; the checkpoint importer transposes).
* Padding is always explicit symmetric ``((p, p), (p, p))`` to match torch's
  ``Conv2d(padding=p)`` semantics exactly (XLA "SAME" pads asymmetrically for
  even inputs, which would break checkpoint parity).
* BatchNorm carries running statistics in the ``batch_stats`` collection;
  ``use_running_average`` is toggled by the train/eval step, not stored state.
* Squeeze-and-excite blocks keep their 1×1 convs as convs (not dense) so the
  torch state dict maps 1:1; XLA fuses the pooled (N,1,1,C) pipeline anyway.

Reference components reproduced (file:line in /root/reference):
``ConvBNAct``/``ConvBN``                 FusionDynMM/src/models/model_utils.py:11-34
``SqueezeAndExcitation``                 model_utils.py:36-51
``SqueezeAndExcitationWeight``           model_utils.py:54-70
``SqueezeAndExciteFusionAdd``            src/models/rgb_depth_fusion.py:13-26
``SqueezeAndExciteReweigh`` (local gate) rgb_depth_fusion.py:29-65
``Swish``/``Hswish``                     model_utils.py:100-115
``Upsample`` (learned-3x3 family)        src/models/model.py:360-410
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynmm_tpu.core.gates import gumbel_softmax

Dtype = Any

# torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 (new-stat fraction).
# flax momentum is the *retained* fraction: 1 - 0.1 = 0.9.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def swish(x):
    return x * jax.nn.sigmoid(x)


def hswish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


_ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "swish": swish,
    "silu": swish,
    "hswish": hswish,
}


def get_activation(name: str) -> Callable:
    """Activation factory mirroring the reference's relu/swish/hswish choices."""
    try:
        return _ACTIVATIONS[name.lower()]
    except KeyError:
        raise NotImplementedError(
            f"Only relu, swish and hswish are supported. Got {name}"
        )


def torch_conv(
    features: int,
    kernel_size: Sequence[int] | int,
    stride: Sequence[int] | int = 1,
    padding: Sequence[int] | int = 0,
    use_bias: bool = True,
    feature_group_count: int = 1,
    dilation: Sequence[int] | int = 1,
    dtype: Optional[Dtype] = None,
    name: Optional[str] = None,
    quant: Optional[str] = None,
) -> nn.Module:
    """``nn.Conv`` configured with torch-style explicit symmetric padding.

    ``quant`` ('calib' / 'int8', see ``nn/quant.py``) swaps in the
    variable-layout-identical ``QConv``; ``None`` (default) keeps the plain
    ``nn.Conv`` so existing float graphs are byte-for-byte unchanged.
    """
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    kwargs = dict(
        features=features,
        kernel_size=tuple(kernel_size),
        strides=tuple(stride),
        padding=tuple((p, p) for p in padding),
        use_bias=use_bias,
        feature_group_count=feature_group_count,
        kernel_dilation=tuple(dilation),
        dtype=dtype,
        name=name,
    )
    if quant is not None:
        from dynmm_tpu.nn.quant import QConv

        return QConv(quant=quant, **kwargs)
    return nn.Conv(**kwargs)


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """3×3 stride-2 max pool with padding 1 (torch ``F.max_pool2d(..., 3, 2, 1)``)."""
    return nn.max_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )


def global_avg_pool(x: jax.Array, keepdims: bool = True) -> jax.Array:
    """Adaptive average pool to 1×1 over NHWC spatial dims."""
    return x.mean(axis=(1, 2), keepdims=keepdims)


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact torch running-stat semantics.

    flax's ``nn.BatchNorm`` updates the running variance with the *biased*
    batch variance; torch's ``BatchNorm2d`` uses the *unbiased* one
    (``× n/(n−1)``) for the running update while normalizing with the biased
    one. That factor is a real train-step divergence vs the reference
    (``model_utils.py`` BNs, NBt1D eps 1e-3) — caught by the gradient/BN
    parity suite (tests/test_torch_train_parity.py). Variable layout matches
    ``nn.BatchNorm`` exactly (params ``{scale, bias}``, batch_stats
    ``{mean, var}``, all (C,) float32) so checkpoints, importers and every
    existing test tree are unaffected.
    """

    use_running_average: Optional[bool] = None
    momentum: float = BN_MOMENTUM  # retained fraction (flax convention)
    epsilon: float = BN_EPS
    use_scale: bool = True
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_running_average = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (feat,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (feat,)
        )
        scale = (
            self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
            if self.use_scale else 1.0
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
            if self.use_bias else 0.0
        )
        axes = tuple(range(x.ndim - 1))
        # stats in at least f32; f64 inputs keep f64 (the x64 parity oracle)
        stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
        if use_running_average:
            mean = ra_mean.value.astype(stat_dtype)
            var = ra_var.value.astype(stat_dtype)
        else:
            xf = x.astype(stat_dtype)
            mean = jnp.mean(xf, axes)
            # two-pass (torch-style) rather than E[x²]−E[x]²: tighter match
            # to the oracle's batch statistics at large activations
            var = jnp.mean(jnp.square(xf - mean), axes)
            if not self.is_initializing():
                n = 1
                for ax in axes:
                    n *= x.shape[ax]
                bessel = n / (n - 1) if n > 1 else 1.0
                m = self.momentum
                dt = ra_mean.value.dtype
                ra_mean.value = (m * ra_mean.value
                                 + (1.0 - m) * mean.astype(dt))
                ra_var.value = (m * ra_var.value
                                + (1.0 - m) * (var * bessel).astype(dt))
        y = (x.astype(stat_dtype) - mean) * jax.lax.rsqrt(
            var + self.epsilon
        ) * jnp.asarray(scale, stat_dtype) + jnp.asarray(bias, stat_dtype)
        out_dtype = self.dtype or stat_dtype
        return y.astype(out_dtype)


class BatchNorm(nn.Module):
    """Thin wrapper pinning torch-compatible BN defaults.

    ``use_running_average`` comes in via call-time argument ``train``.
    """

    eps: float = BN_EPS
    momentum: float = BN_MOMENTUM
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return TorchBatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            dtype=self.dtype,
            name="bn",
        )(x)


class ConvBNAct(nn.Module):
    """conv → BN → activation (bias-free conv, torch-style padding).

    Padding rule matches the reference: ``k // 2 + dilation - 1``.
    """

    features: int
    kernel_size: int
    activation: Callable = jax.nn.relu
    dilation: int = 1
    stride: int = 1
    dtype: Optional[Dtype] = None
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        padding = self.kernel_size // 2 + self.dilation - 1
        x = torch_conv(
            self.features,
            self.kernel_size,
            stride=self.stride,
            padding=padding,
            use_bias=False,
            dilation=self.dilation,
            dtype=self.dtype,
            name="conv",
            quant=self.quant,
        )(x)
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)
        return self.activation(x)


class ConvBN(nn.Module):
    """conv → BN without activation (``model_utils.py:26-34``)."""

    features: int
    kernel_size: int
    dtype: Optional[Dtype] = None
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = torch_conv(
            self.features,
            self.kernel_size,
            padding=self.kernel_size // 2,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
            quant=self.quant,
        )(x)
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)
        return x


class _Conv1x1Params(nn.Module):
    """Parameter holder for a 1×1 conv (kernel (1,1,Cin,Cout) + bias),
    layout-identical to ``nn.Conv`` so checkpoint import is unchanged, but
    exposing the raw arrays for fused kernels."""

    in_channels: int
    out_channels: int

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.in_channels, self.out_channels),
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))


class SqueezeAndExcitation(nn.Module):
    """Channel recalibration: global pool → 1×1 reduce → act → 1×1 expand →
    sigmoid → scale (``model_utils.py:36-51``).

    The path expresses the 1×1 convs as matmuls on the pooled (N, C)
    vector (identical math). A fused single-HBM-pass Pallas variant exists
    (``dynmm_tpu.kernels.se``, exactness-tested) but measured SLOWER
    in-model — XLA already keeps the pooled vector on-chip and the custom
    call pays an operand relayout (docs/DESIGN.md, Pallas closure) — so
    the in-model routing was removed.
    """

    channels: int
    reduction: int = 16
    activation: Callable = jax.nn.relu
    dtype: Optional[Dtype] = None

    def setup(self):
        self.fc1 = _Conv1x1Params(
            self.channels, self.channels // self.reduction, name="fc1")
        self.fc2 = _Conv1x1Params(
            self.channels // self.reduction, self.channels, name="fc2")

    def weights(self):
        """(w1, b1, w2, b2) raw arrays for fused kernels (cast to dtype)."""
        w1, b1 = self.fc1.kernel[0, 0], self.fc1.bias
        w2, b2 = self.fc2.kernel[0, 0], self.fc2.bias
        if self.dtype is not None:
            w1, b1, w2, b2 = (a.astype(self.dtype) for a in (w1, b1, w2, b2))
        return w1, b1, w2, b2

    def scale(self, x):
        """The (B, C) sigmoid recalibration vector (no map traffic)."""
        w1, b1, w2, b2 = self.weights()
        pooled = x.mean(axis=(1, 2))
        s = self.activation(pooled @ w1 + b1)
        return jax.nn.sigmoid(s @ w2 + b2)

    def __call__(self, x):
        w1, b1, w2, b2 = self.weights()

        pooled = x.mean(axis=(1, 2))  # (N, C)
        s = self.activation(pooled @ w1 + b1)
        s = jax.nn.sigmoid(s @ w2 + b2)
        return x * s[:, None, None, :]


class SqueezeAndExcitationWeight(nn.Module):
    """SE recalibration collapsed to a per-sample scalar
    (``model_utils.py:54-70``): returns ``(x * se(x)).mean(axes=(H,W,C))``."""

    channels: int
    reduction: int = 16
    activation: Callable = jax.nn.relu
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        w = global_avg_pool(x)
        w = torch_conv(
            self.channels // self.reduction, 1, dtype=self.dtype, name="fc1"
        )(w)
        w = self.activation(w)
        w = torch_conv(self.channels, 1, dtype=self.dtype, name="fc2")(w)
        w = jax.nn.sigmoid(w)
        y = x * w
        return y.mean(axis=(1, 2, 3))


class SqueezeAndExciteFusionAdd(nn.Module):
    """ESANet fusion cell: per-modality SE recalibration, then add
    (``rgb_depth_fusion.py:13-26``)."""

    channels: int
    activation: Callable = jax.nn.relu
    dtype: Optional[Dtype] = None

    def setup(self):
        self.se_rgb = SqueezeAndExcitation(
            self.channels, activation=self.activation, dtype=self.dtype,
            name="se_rgb",
        )
        self.se_depth = SqueezeAndExcitation(
            self.channels, activation=self.activation, dtype=self.dtype,
            name="se_depth",
        )

    def __call__(self, rgb, depth):
        return self.se_rgb(rgb) + self.se_depth(depth)

    def fuse_mixed(self, rgb, depth, w_rgb):
        """``w·rgb + (1−w)·(se(rgb) + se(depth))`` with the per-sample mix
        FOLDED into the SE scale vectors — exact algebra
        (``w·r + (1−w)(r·s_r + d·s_d) = r·(w+(1−w)s_r) + d·((1−w)s_d)``),
        so the gate mixing used by every DynMM forward costs zero extra
        full-map traffic over plain SE-add fusion. ``w_rgb``: (B,) weight
        on the unfused rgb branch."""
        s_r = self.se_rgb.scale(rgb)
        s_d = self.se_depth.scale(depth)
        w = w_rgb[:, None].astype(s_r.dtype)
        s_r = w + (1.0 - w) * s_r
        s_d = (1.0 - w) * s_d
        return (rgb * s_r[:, None, None, :]
                + depth * s_d[:, None, None, :])

    def fuse_and_pool(self, rgb, depth):
        """Stem tail: SE-add + maxpool(3,2,1) of both the fused map AND the
        raw second modality. Returns
        (pool(se_fusion_add(rgb, depth)), pool(depth)).

        A fused two-HBM-pass Pallas variant exists
        (``kernels.stem_fuse``, bit-exact on-chip) but measured SLOWER than
        XLA's unfused graph (2.40 vs 1.66 ms at bs=8 —
        tools/archive/perf_stem_parts.py decomposes the VPU overhead), so
        the in-model routing was removed (docs/DESIGN.md, Pallas closure)."""
        fused = self(rgb, depth)
        return max_pool_3x3_s2(fused), max_pool_3x3_s2(depth)


class SqueezeAndExciteReweigh(nn.Module):
    """Local per-stage gate op (``rgb_depth_fusion.py:29-65``).

    SE over concat(rgb, depth) → sigmoid scalar w → stack [w, 1−w] → Gumbel
    softmax (hard at test). ``prev_weight`` chains gates so a skipped stage
    forces later skips. Returns (batch, 2, 1, 1)-shaped weights to broadcast
    over NHWC... here (batch, 2) and callers index columns — NHWC broadcasting
    is done at the call site.

    Being a *sampled* gate it takes an explicit PRNG key. ``random_policy``
    draws uniform branch choices (the reference's ``random=True`` ablation).
    """

    channels_in: int  # per-modality channels; SE sees 2x this
    activation: Callable = jax.nn.relu
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        key: jax.Array,
        rgb: jax.Array,
        depth: jax.Array,
        temp: float = 1.0,
        hard: bool = False,
        prev_weight: Optional[jax.Array] = None,
        random_policy: bool = False,
        test: bool = False,
    ) -> jax.Array:
        bs = rgb.shape[0]
        if random_policy:
            b0 = jax.random.randint(key, (bs,), 0, 2).astype(rgb.dtype)
            w_norm = jnp.stack([b0, 1.0 - b0], axis=1)
        else:
            x = jnp.concatenate([rgb, depth], axis=-1)
            w = SqueezeAndExcitationWeight(
                self.channels_in * 2,
                activation=self.activation,
                dtype=self.dtype,
                name="se",
            )(x)
            w = jax.nn.sigmoid(w)
            logits = jnp.stack([w, 1.0 - w], axis=1)
            # test-time forces a hard sample, mirroring the reference
            w_norm = gumbel_softmax(key, logits / temp, tau=1.0, hard=hard or test)
        if prev_weight is not None:
            b1 = w_norm[:, 1] * prev_weight
            w_norm = jnp.stack([1.0 - b1, b1], axis=1)
        return w_norm


def _bilinear_3x3_kernel(channels: int, dtype=jnp.float32) -> jax.Array:
    """Depthwise 3×3 kernel that mimics ×2 bilinear upsampling after a nearest
    upscale (``model.py:385-391``). HWIO layout with I=1 (depthwise)."""
    k = jnp.array(
        [
            [0.0625, 0.1250, 0.0625],
            [0.1250, 0.2500, 0.1250],
            [0.0625, 0.1250, 0.0625],
        ],
        dtype=dtype,
    )
    return jnp.tile(k[:, :, None, None], (1, 1, 1, channels))


def resize_nearest(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize of NHWC to (H, W) — torch 'nearest' semantics:
    source index = ``floor(i · in / out)`` (asymmetric, NOT half-pixel).

    ``jax.image.resize(method='nearest')`` rounds half-pixel centers, which
    agrees with torch on integer upscales but picks different source cells on
    fractional scales (caught by the train-parity oracle: PPM's 5×5 bin
    map resized to a 3×4 context grid at 96×128 input). Integer upscales take
    the repeat path (no gather — XLA lowers it to a broadcast-reshape)."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    if oh % h == 0 and ow % w == 0:
        return jnp.repeat(jnp.repeat(x, oh // h, axis=1), ow // w, axis=2)
    idx_h = (jnp.arange(oh) * h) // oh
    idx_w = (jnp.arange(ow) * w) // ow
    return x[:, idx_h][:, :, idx_w]


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize matching torch ``align_corners=False``.

    ``jax.image.resize(method='linear')`` implements the half-pixel-center
    convention, identical to torch's align_corners=False.
    """
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, out_hw[0], out_hw[1], c), method="linear")


def first_argmax(x: jax.Array, axis: int = -1) -> jax.Array:
    """``jnp.argmax`` (first-max tie-break) lowered as two plain max-reduces
    instead of XLA's variadic argmax reduce.

    On v5e the variadic reduce over the channel (lane) axis of the bs=8
    480×640×40 logits map costs +16.3 ms inside the serving graph while
    this two-pass form costs +3.6 ms, and an ``optimization_barrier`` does
    NOT close the gap — it is the variadic reduce itself, not a fusion
    artifact (tools/perf_argmax_net.py, interleaved medians). Used by the
    eval step and predict.py class-map extraction, matching the reference's
    ``torch.argmax`` post-processing (``FusionDynMM/eval.py``) bit-exactly,
    including first-index ties: the second pass maxes a *reversed* iota
    masked to the max hits, so the earliest hit carries the largest value.

    Falls back to ``jnp.argmax`` when the axis length is not exactly
    representable in ``x.dtype`` (the mask·iota product must be lossless:
    bf16 → ≤256 classes, f32 → ≤2²⁴). NaN inputs differ from ``jnp.argmax``
    (no hits → returns the last index); segmentation logits are NaN-free
    (the trainer's NaN guard enforces this upstream).
    """
    c = x.shape[axis]
    limit = {
        jnp.dtype(jnp.bfloat16): 256,
        jnp.dtype(jnp.float16): 2048,
        jnp.dtype(jnp.float32): 1 << 24,
        jnp.dtype(jnp.float64): 1 << 53,
    }.get(jnp.dtype(x.dtype))
    if limit is None or c > limit:
        return jnp.argmax(x, axis=axis).astype(jnp.int32)
    m = jnp.max(x, axis=axis, keepdims=True)
    shape = [1] * x.ndim
    shape[axis] = c
    rev_iota = jnp.arange(c - 1, -1, -1, dtype=x.dtype).reshape(shape)
    hit = (x >= m).astype(x.dtype) * rev_iota
    return ((c - 1) - jnp.max(hit, axis=axis)).astype(jnp.int32)


class _DepthwiseParams(nn.Module):
    """Param holder for a depthwise 3×3 conv ((3,3,1,C) kernel + bias),
    layout-identical to ``nn.Conv(feature_group_count=C)`` for checkpoint
    parity, initialized to the bilinear-mimicking kernel."""

    channels: int

    def setup(self):
        self.kernel = self.param(
            "kernel",
            lambda key, shape=None: _bilinear_3x3_kernel(self.channels),
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.channels,))


# Phase-merge matrix for fusing nearest-×2 + 3×3 depthwise conv into one
# dilated conv: output row phase a∈{0,1} at src offset s reads the k-rows in
# S_r — phase 0: {-1: k0, 0: k1+k2}; phase 1: {0: k0+k1, +1: k2} (from
# up[p] = x[p//2] index algebra). Interleaved into a 4-tap kernel on a
# 2×-lhs-dilated input with padding 2, rows u=0..3 ↔ (phase, offset)
# (0,-1),(1,0),(0,0),(1,+1).
_UPSAMPLE_PHASE_MERGE = jnp.array(
    [[1.0, 0.0, 0.0], [1.0, 1.0, 0.0], [0.0, 1.0, 1.0], [0.0, 0.0, 1.0]]
)


def learned3x3_zeropad_fused(
    x: jax.Array, k3: jax.Array, bias: jax.Array, impl: str = "auto"
):
    """nearest-×2 followed by zero-padded depthwise 3×3 conv, fused so the
    4×-larger nearest intermediate never hits HBM (the decoder's dominant
    HBM-traffic term; reference semantics ``model.py:385-391``). Exact up to
    kernel-entry pre-summation.

    The output decomposes into 4 polyphase components, each a per-channel
    2×2 stencil of the *input* map (from ``up[p] = x[p//2]`` index algebra).

    impl='shift': 16 broadcast FMAs on shifted input slices + one interleave
    reshape — pure elementwise work XLA fuses into a single pass.
    impl='dilated': one depthwise conv with a 4×4 phase-merged kernel on a
    2×-lhs-dilated input.
    impl='auto' (default): measured policy on v5e — 'dilated' for narrow
    (<128-lane) channel counts, where the shift form's interleave overfuses
    into consumers and costs ~3 ms per final C=40 map at 480×640/bs=8
    (in-model: 6.2 ms shift vs 0.2 ms dilated for the two logits upsamples);
    'shift' for ≥128 channels, where the dilated depthwise lowering loses
    ~6 ms across the wide decoder upsamples instead.

    x: (N, H, W, C); k3: (3, 3, C) depthwise taps; bias: (C,).
    """
    n, h, w, c = x.shape
    if impl == "auto":
        impl = "dilated" if c < 128 else "shift"
    a = _UPSAMPLE_PHASE_MERGE.astype(k3.dtype)
    kt = jnp.einsum("us,stc,vt->uvc", a, k3, a)  # (4, 4, C)
    if impl == "dilated":
        dn = jax.lax.conv_dimension_numbers(
            x.shape, (4, 4, 1, c), ("NHWC", "HWIO", "NHWC")
        )
        out = jax.lax.conv_general_dilated(
            x,
            kt[:, :, None, :],
            window_strides=(1, 1),
            padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=dn,
            feature_group_count=c,
        )
        return out + bias

    # kt rows/cols u ∈ 0..3 ↔ (phase a, src offset s): (0,-1),(1,0),(0,0),(1,+1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def sl(s, t):  # input shifted by (s, t) ∈ {-1, 0, 1}
        return jax.lax.dynamic_slice(xp, (0, 1 + s, 1 + t, 0), (n, h, w, c))

    u_of = {(0, -1): 0, (1, 0): 1, (0, 0): 2, (1, 1): 3}

    def phase(pa, pb):
        offs = ((-1, 0) if pa == 0 else (0, 1), (-1, 0) if pb == 0 else (0, 1))
        acc = None
        for s in offs[0]:
            for t in offs[1]:
                term = kt[u_of[(pa, s)], u_of[(pb, t)]] * sl(s, t)
                acc = term if acc is None else acc + term
        return acc + bias

    row0 = jnp.stack([phase(0, 0), phase(0, 1)], axis=3)  # (N,H,W,2,C)
    row1 = jnp.stack([phase(1, 0), phase(1, 1)], axis=3)
    out6 = jnp.stack([row0, row1], axis=2)  # (N,H,2,W,2,C)
    return out6.reshape(n, 2 * h, 2 * w, c)


class Upsample(nn.Module):
    """×2 upsampling: 'nearest' | 'bilinear' | 'learned-3x3' | 'learned-3x3-zeropad'.

    The learned variants do nearest ×2 followed by a depthwise 3×3 conv
    initialized to the bilinear kernel (``model.py:360-410``). 'learned-3x3'
    replication-pads by 1 then convs valid; '-zeropad' zero-pads inside conv.

    ``fused`` (default) lowers the zeropad variant to one dilated depthwise
    conv (``learned3x3_zeropad_fused``) so the 4×-larger nearest intermediate
    never hits HBM. A Pallas variant exists (``dynmm_tpu.kernels.upsample``,
    exactness-tested, compiles on-chip) but measured SLOWER in-model on the
    lane-aligned decoder upsamples it targets (0.93-0.98× vs XLA,
    tools/archive/perf_upsample_on.py), so the in-model routing was removed
    (docs/DESIGN.md, Pallas closure).
    """

    mode: str
    channels: Optional[int] = None
    dtype: Optional[Dtype] = None
    fused: bool = True
    fused_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1] * 2, x.shape[2] * 2
        if "learned-3x3" in self.mode:
            c = x.shape[-1]
            p = _DepthwiseParams(c, name="conv")
            kernel = p.kernel  # (3, 3, 1, C)
            bias = p.bias
            if self.dtype is not None:
                kernel = kernel.astype(self.dtype)
                bias = bias.astype(self.dtype)
                x = x.astype(self.dtype)
            if self.mode == "learned-3x3-zeropad" and self.fused:
                return learned3x3_zeropad_fused(
                    x, kernel[:, :, 0, :], bias, impl=self.fused_impl
                )
            x = resize_nearest(x, (h, w))
            if self.mode == "learned-3x3":
                x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
                padding = 0
            else:  # learned-3x3-zeropad
                padding = 1
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
            )
            x = jax.lax.conv_general_dilated(
                x, kernel, (1, 1), ((padding, padding), (padding, padding)),
                dimension_numbers=dn, feature_group_count=c,
            )
            return x + bias
        elif self.mode == "nearest":
            return resize_nearest(x, (h, w))
        elif self.mode == "bilinear":
            return resize_bilinear(x, (h, w))
        raise NotImplementedError(f"Unknown upsampling mode {self.mode}")
