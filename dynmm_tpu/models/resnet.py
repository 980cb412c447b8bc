"""ResNet encoders with staged forwards (NHWC, flax.linen).

Re-implementation of the encoder family the reference builds on
(``FusionDynMM/src/models/resnet.py``): three block types —

* ``BasicBlock``      (resnet.py:42-84)
* ``NonBottleneck1D`` (ERFNet factorized 3×1/1×3 block, resnet.py:87-147,
  BatchNorm eps 1e-3 at :110)
* ``Bottleneck``      (resnet.py:150-192)

— plus the *staged* API (``forward_first_conv`` / ``forward_layer1..4``,
resnet.py:352-379) that the fusion models interleave with depth fusion.

TPU-first notes: NHWC layout; explicit symmetric padding for torch parity;
the 1-channel depth stem is a first-class constructor argument (the torch
version sums pretrained conv1 weights at load time — our checkpoint importer
does the same transformation on import). The NBt1D factorized convs map to two
skinny XLA convolutions that fuse with their activations.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dynmm_tpu.nn.layers import (BN_EPS, BN_MOMENTUM, TorchBatchNorm,
                                 max_pool_3x3_s2, torch_conv)

Dtype = Any

# ImageNet-pretrained layouts
RESNET_LAYERS = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3), "resnet50": (3, 4, 6, 3)}

he_normal_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _bn(name: str, eps: float, dtype, train: bool):
    return TorchBatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=eps,
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    """conv3x3(s) → BN → act → conv3x3 → BN → +identity → act."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    activation: Callable = jax.nn.relu
    dtype: Optional[Dtype] = None
    expansion: int = 1
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = torch_conv(
            self.planes, 3, stride=self.stride, padding=1, use_bias=False,
            dtype=self.dtype, name="conv1", quant=self.quant,
        )(x)
        out = _bn("bn1", BN_EPS, self.dtype, train)(out)
        out = self.activation(out)
        out = torch_conv(
            self.planes, 3, padding=1, use_bias=False, dtype=self.dtype,
            name="conv2", quant=self.quant,
        )(out)
        out = _bn("bn2", BN_EPS, self.dtype, train)(out)
        if self.has_downsample:
            identity = torch_conv(
                self.planes, 1, stride=self.stride, use_bias=False,
                dtype=self.dtype, name="ds_conv", quant=self.quant,
            )(x)
            identity = _bn("ds_bn", BN_EPS, self.dtype, train)(identity)
        return self.activation(out + identity)


class NonBottleneck1D(nn.Module):
    """ERFNet factorized residual block: 3×1 → act → 1×3 → BN → act →
    3×1 → act → 1×3 → BN → +identity → act. BN eps = 1e-3; convs carry bias.

    A fused whole-block Pallas kernel exists (``dynmm_tpu.kernels.nbt1d``,
    exactness-tested; 1.7× over XLA standalone with whole-map tiles) but
    inside the full model the resident (3,C,C) weight mats (12.6 MB at
    C=512) squeeze the row tiles until the win inverts, so the in-model
    routing was removed (docs/DESIGN.md, Pallas closure).
    """

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dilation: int = 1
    activation: Callable = jax.nn.relu
    dtype: Optional[Dtype] = None
    expansion: int = 1
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dilation
        out = torch_conv(
            self.planes, (3, 1), stride=(self.stride, 1), padding=(1, 0),
            use_bias=True, dtype=self.dtype, name="conv3x1_1",
            quant=self.quant,
        )(x)
        out = self.activation(out)
        out = torch_conv(
            self.planes, (1, 3), stride=(1, self.stride), padding=(0, 1),
            use_bias=True, dtype=self.dtype, name="conv1x3_1",
            quant=self.quant,
        )(out)
        out = _bn("bn1", 1e-3, self.dtype, train)(out)
        out = self.activation(out)
        out = torch_conv(
            self.planes, (3, 1), padding=(d, 0), dilation=(d, 1),
            use_bias=True, dtype=self.dtype, name="conv3x1_2",
            quant=self.quant,
        )(out)
        out = self.activation(out)
        out = torch_conv(
            self.planes, (1, 3), padding=(0, d), dilation=(1, d),
            use_bias=True, dtype=self.dtype, name="conv1x3_2",
            quant=self.quant,
        )(out)
        out = _bn("bn2", 1e-3, self.dtype, train)(out)
        identity = x
        if self.has_downsample:
            identity = torch_conv(
                self.planes, 1, stride=self.stride, use_bias=False,
                dtype=self.dtype, name="ds_conv", quant=self.quant,
            )(x)
            identity = _bn("ds_bn", BN_EPS, self.dtype, train)(identity)
        return self.activation(out + identity)


class Bottleneck(nn.Module):
    """1×1 reduce → 3×3(s) → 1×1 expand(×4), BN+act between, +identity."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    activation: Callable = jax.nn.relu
    dtype: Optional[Dtype] = None
    expansion: int = 4
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = torch_conv(
            self.planes, 1, use_bias=False, dtype=self.dtype, name="conv1",
            quant=self.quant,
        )(x)
        out = _bn("bn1", BN_EPS, self.dtype, train)(out)
        out = self.activation(out)
        out = torch_conv(
            self.planes, 3, stride=self.stride, padding=1, use_bias=False,
            dtype=self.dtype, name="conv2", quant=self.quant,
        )(out)
        out = _bn("bn2", BN_EPS, self.dtype, train)(out)
        out = self.activation(out)
        out = torch_conv(
            self.planes * 4, 1, use_bias=False, dtype=self.dtype,
            name="conv3", quant=self.quant,
        )(out)
        out = _bn("bn3", BN_EPS, self.dtype, train)(out)
        if self.has_downsample:
            identity = torch_conv(
                self.planes * 4, 1, stride=self.stride, use_bias=False,
                dtype=self.dtype, name="ds_conv", quant=self.quant,
            )(x)
            identity = _bn("ds_bn", BN_EPS, self.dtype, train)(identity)
        return self.activation(out + identity)


_BLOCKS = {
    "BasicBlock": (BasicBlock, 1),
    "NonBottleneck1D": (NonBottleneck1D, 1),
    "Bottleneck": (Bottleneck, 4),
}


class _StemKernel(nn.Module):
    """Parameter holder for the 7×7/2 stem conv kernel (HWIO), layout-
    identical to ``nn.Conv``'s param so checkpoint import/export and init
    distributions are unchanged."""

    in_channels: int

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, self.in_channels, 64)
        )


def _s2d_kernel(w: jax.Array) -> jax.Array:
    """Re-tile a (7,7,C,64) stride-2 pad-3 stem kernel into the equivalent
    (4,4,4C,64) kernel over 2×2 space-to-depth-packed input.

    Derivation: with t = u−3 ∈ [−3,3], the source index 2i+t packs to
    (i + ⌊t/2⌋, t mod 2); each (tap a=⌊t/2⌋+2, parity r=t mod 2) pair is hit
    by exactly one t, so the mapping is a scatter of the original taps.
    Packed-channel order: (r, s, c) → r*2C + s*C + c.
    """
    c, o = w.shape[2], w.shape[3]
    out = jnp.zeros((4, 4, 4 * c, o), dtype=w.dtype)
    for u in range(7):
        t = u - 3
        a, r = (t // 2) + 2, t % 2
        for v in range(7):
            tv = v - 3
            b, s = (tv // 2) + 2, tv % 2
            out = out.at[a, b, (r * 2 + s) * c : (r * 2 + s) * c + c, :].set(
                w[u, v]
            )
    return out


def _space_to_depth(x: jax.Array) -> jax.Array:
    """(N, H, W, C) → (N, H/2, W/2, 4C) with channel order (r, s, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # n, h2, w2, r, s, c
    return x.reshape(n, h // 2, w // 2, 4 * c)


def space_to_depth_host(x: np.ndarray) -> np.ndarray:
    """Host-side (numpy) 2×2 space-to-depth packing, layout-identical to
    ``_space_to_depth``: (N, H, W, C) → (N, H/2, W/2, 4C), channel order
    (row parity, col parity, c).

    Serving preprocessing: feeding ``stem`` a pre-packed input skips the
    on-device shuffle, which is the expensive half of the s2d lowering —
    at bs=1 480×640 the packed 4×4 stem conv runs 75 µs where the plain
    7×7 form costs 413+156 µs, but the on-device transpose costs ~670 µs
    (tools/perf_bs1_opt.py traces). Host packing is a cache-friendly
    strided copy that belongs with resize/normalize in the data pipeline.

    Uses the native OpenMP kernel when available (the single-threaded
    numpy transpose costs ~23 ms for a bs=8 480×640 rgb+depth pair —
    more than the 10.5 ms device step it feeds); falls back to numpy.
    """
    n, h, w, c = x.shape
    if x.dtype == np.float32:
        from dynmm_tpu import native

        if native.lib() is not None:
            return native.space_to_depth(x)
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return np.ascontiguousarray(x.reshape(n, h // 2, w // 2, 4 * c))


class ResNetStage(nn.Module):
    """One residual stage: ``n_blocks`` blocks, first with stride/downsample."""

    block: str
    planes: int
    n_blocks: int
    stride: int = 1
    in_planes: int = 64
    activation: Callable = jax.nn.relu
    dtype: Optional[Dtype] = None
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, expansion = _BLOCKS[self.block]
        extra = {}
        needs_ds = self.stride != 1 or self.in_planes != self.planes * expansion
        x = block_cls(
            self.planes,
            stride=self.stride,
            has_downsample=needs_ds,
            activation=self.activation,
            dtype=self.dtype,
            quant=self.quant,
            name="block0",
            **extra,
        )(x, train)
        for i in range(1, self.n_blocks):
            x = block_cls(
                self.planes,
                activation=self.activation,
                dtype=self.dtype,
                quant=self.quant,
                name=f"block{i}",
                **extra,
            )(x, train)
        return x


class ResNet(nn.Module):
    """Staged ResNet encoder.

    ``stem(x)`` = 7×7/2 conv + BN + act (the reference's
    ``forward_first_conv``; max-pool is applied by the caller, matching
    resnet.py:352-358). ``layer1..layer4`` run the four residual stages.
    ``__call__`` is the plain classification-backbone forward returning the
    stage-4 feature map.
    """

    layers: Sequence[int]
    block: str = "BasicBlock"
    input_channels: int = 3
    activation: Callable = jax.nn.relu
    dtype: Optional[Dtype] = None
    remat: bool = False  # rematerialize stages (jax.checkpoint) for training
    s2d_stem: bool = False  # space-to-depth stem (see ``stem``)
    # int8 PTQ serving ('calib' / 'int8', nn/quant.py) — applies to the
    # stage convs; the stem conv keeps float (its input is the image and
    # its OUTPUT bytes are set by the consumer, not the conv dtype)
    quant: Optional[str] = None

    @property
    def expansion(self) -> int:
        return _BLOCKS[self.block][1]

    @property
    def down_channels(self) -> dict[int, int]:
        e = self.expansion
        return {2: 64, 4: 64 * e, 8: 128 * e, 16: 256 * e, 32: 512 * e}

    def setup(self):
        # raw 7×7 stem kernel (same param tree as nn.Conv: conv1/kernel) so the
        # space-to-depth path can re-tile it; the conv itself is applied in
        # ``stem`` via lax.conv_general_dilated.
        self.conv1 = _StemKernel(self.input_channels, name="conv1")
        self.bn1 = TorchBatchNorm(
            momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype, name="bn1"
        )
        e = self.expansion
        plan = [(64, 1, 64), (128, 2, 64 * e), (256, 2, 128 * e), (512, 2, 256 * e)]
        stage_cls = (
            nn.remat(ResNetStage, static_argnums=(2,)) if self.remat else ResNetStage
        )
        stages = []
        for i, ((planes, stride, in_planes), n) in enumerate(zip(plan, self.layers)):
            stages.append(
                stage_cls(
                    self.block,
                    planes,
                    n,
                    stride=stride,
                    in_planes=in_planes,
                    activation=self.activation,
                    dtype=self.dtype,
                    quant=self.quant,
                    name=f"layer{i + 1}",
                )
            )
        self.stages = stages

    def stem(self, x, train: bool = False):
        """7×7/2 conv (pad 3) + BN + act — the reference's
        ``forward_first_conv``. When ``s2d_stem`` is set and the input is
        even-sized, the conv runs as a mathematically-identical 4×4 conv over
        2×2 space-to-depth-packed input: 3-channel convs waste the 128-wide
        MXU, the packed 12-channel form is ~4× denser.

        An input with ``4*input_channels`` channels is treated as ALREADY
        space-to-depth packed (``space_to_depth_host``) and goes straight to
        the packed conv — the serving fast path that keeps the 2×2 shuffle
        off the device entirely."""
        w = self.conv1.kernel
        if self.dtype is not None:
            w = w.astype(self.dtype)
            x = x.astype(self.dtype)
        if x.shape[-1] == 4 * self.input_channels:
            wp = _s2d_kernel(w)
            dnp = jax.lax.conv_dimension_numbers(
                x.shape, wp.shape, ("NHWC", "HWIO", "NHWC")
            )
            x = jax.lax.conv_general_dilated(
                x, wp, window_strides=(1, 1), padding=((2, 1), (2, 1)),
                dimension_numbers=dnp,
            )
            x = self.bn1(x, use_running_average=not train)
            return self.activation(x)
        if x.shape[-1] != self.input_channels:
            raise ValueError(
                f"stem expects {self.input_channels} channels (raw) or "
                f"{4 * self.input_channels} (space-to-depth packed); got "
                f"{x.shape[-1]}"
            )
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        if self.s2d_stem and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            xp = _space_to_depth(x)
            wp = _s2d_kernel(w)
            dnp = jax.lax.conv_dimension_numbers(
                xp.shape, wp.shape, ("NHWC", "HWIO", "NHWC")
            )
            x = jax.lax.conv_general_dilated(
                xp, wp, window_strides=(1, 1), padding=((2, 1), (2, 1)),
                dimension_numbers=dnp,
            )
        else:
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=(2, 2), padding=((3, 3), (3, 3)),
                dimension_numbers=dn,
            )
        x = self.bn1(x, use_running_average=not train)
        return self.activation(x)

    def layer1(self, x, train: bool = False):
        return self.stages[0](x, train)

    def layer2(self, x, train: bool = False):
        return self.stages[1](x, train)

    def layer3(self, x, train: bool = False):
        return self.stages[2](x, train)

    def layer4(self, x, train: bool = False):
        return self.stages[3](x, train)

    def __call__(self, x, train: bool = False):
        x = self.stem(x, train)
        x = max_pool_3x3_s2(x)
        for stage in self.stages:
            x = stage(x, train)
        return x


def make_resnet(
    name: str,
    block: str = "BasicBlock",
    input_channels: int = 3,
    activation: Callable = jax.nn.relu,
    dtype: Optional[Dtype] = None,
    module_name: Optional[str] = None,
    remat: bool = False,
    s2d_stem: bool = False,
    quant: Optional[str] = None,
) -> ResNet:
    """Factory mirroring the reference constructors: ``resnet18/34`` honor the
    ``block`` choice; ``resnet50`` always uses Bottleneck (resnet.py:450-466).
    """
    if name == "resnet50":
        block = "Bottleneck"
    elif block not in ("BasicBlock", "NonBottleneck1D"):
        raise NotImplementedError(f"Block {block} is not implemented")
    kwargs = {}
    if module_name is not None:
        kwargs["name"] = module_name
    return ResNet(
        layers=RESNET_LAYERS[name],
        block=block,
        input_channels=input_channels,
        activation=activation,
        dtype=dtype,
        remat=remat,
        s2d_stem=s2d_stem,
        quant=quant,
        **kwargs,
    )
