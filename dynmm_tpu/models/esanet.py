"""ESANet: efficient RGB-D semantic segmentation (static baseline) + decoder.

Re-implementation of the reference architecture
(``FusionDynMM/src/models/model.py``): two ResNet encoders (RGB 3-ch,
depth 1-ch), depth fused into the RGB stream after the stem and each of the
four stages (add or SE-add, model.py:191-236), PPM context module, three
decoder modules with NonBottleneck1D blocks and pyramid side outputs
(model.py:244-357), and 2× learned-3x3 upsampling to full resolution.

Training mode returns 4-scale outputs ``(full, 1/8, 1/16, 1/32)`` for pyramid
supervision; eval returns the full-resolution logits only.

The TPU redesign keeps everything NHWC / static-shape; the per-stage fusion
adds and SE scales fuse into the convolutions under XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynmm_tpu.models.context import get_context_module
from dynmm_tpu.models.resnet import ResNet, make_resnet
from dynmm_tpu.nn.layers import (
    ConvBNAct,
    SqueezeAndExciteFusionAdd,
    Upsample,
    get_activation,
    max_pool_3x3_s2,
    torch_conv,
)
from dynmm_tpu.models.resnet import NonBottleneck1D

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ESANetConfig:
    """Architecture hyper-parameters shared by the ESANet family.

    Defaults follow the reference CLI defaults (``src/args.py`` +
    ``build_model.py``): decreasing decoder channels [512, 256, 128],
    3 decoder blocks per module, PPM context, SE-add fusion,
    learned-3x3-zeropad upsampling.
    """

    height: int = 480
    width: int = 640
    num_classes: int = 40
    encoder_rgb: str = "resnet34"
    encoder_depth: str = "resnet34"
    encoder_block: str = "NonBottleneck1D"
    channels_decoder: Sequence[int] = (512, 256, 128)
    nr_decoder_blocks: Sequence[int] = (3, 3, 3)
    activation: str = "relu"
    encoder_decoder_fusion: str = "add"
    context_module: str = "ppm"
    fuse_depth_in_rgb_encoder: str = "SE-add"
    upsampling: str = "learned-3x3-zeropad"
    dtype: Any = None
    remat: bool = False       # rematerialize encoder stages in training
    # Space-to-depth stem lowering (same math). Default OFF: XLA's native
    # small-channel strided conv path runs the plain 7×7/2 stem in 0.05 ms
    # at bs=8 while the s2d-2 form costs 1.7 ms and deeper 2×2/4×4
    # output-packed forms 3+ ms (transpose-dominated) —
    # tools/perf_stemconv.py. The round-1 "3-channel convs waste the MXU"
    # conclusion did not survive contention-robust re-measurement.
    s2d_stem: bool = False
    # int8 post-training quantization for serving (nn/quant.py):
    # None (float, default) | 'calib' (float + activation-scale capture
    # into the mutable 'quant' collection) | 'int8' (quantized convs in
    # encoder stages, decoder ConvBNActs/blocks, skip layers, conv_out).
    # Float checkpoints load unchanged into quant models (identical param
    # layout); calibrate with utils.quantize.calibrate.
    quant: Optional[str] = None

    @property
    def act(self) -> Callable:
        return get_activation(self.activation)


class DecoderModule(nn.Module):
    """3×3 ConvBNAct → N NonBottleneck1D blocks → (side output) → ×2 upsample
    → add encoder skip (model.py:311-357)."""

    channels_dec: int
    nr_blocks: int
    num_classes: int
    upsampling_mode: str
    encoder_decoder_fusion: str = "add"
    activation: Callable = jax.nn.relu
    dtype: Optional[Dtype] = None
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        out = ConvBNAct(
            self.channels_dec, 3, activation=self.activation, dtype=self.dtype,
            quant=self.quant, name="conv3x3",
        )(x, train)
        for i in range(self.nr_blocks):
            out = NonBottleneck1D(
                self.channels_dec, activation=self.activation, dtype=self.dtype,
                quant=self.quant, name=f"decoder_blocks{i}",
            )(out, train)
        # Always trace the side conv so its params exist in every mode; when
        # the caller discards out_side (eval) XLA dead-code-eliminates it.
        out_side = torch_conv(
            self.num_classes, 1, dtype=self.dtype, name="side_output"
        )(out)
        out = Upsample(
            mode=self.upsampling_mode, channels=self.channels_dec,
            dtype=self.dtype, name="upsample",
        )(out)
        if self.encoder_decoder_fusion == "add" and skip is not None:
            out = out + skip
        return out, out_side


class Decoder(nn.Module):
    """Three decoder modules + 3×3 output conv + two ×2 upsamples
    (model.py:244-308)."""

    channels_decoder: Sequence[int]
    nr_decoder_blocks: Sequence[int]
    num_classes: int
    upsampling_mode: str
    encoder_decoder_fusion: str = "add"
    activation: Callable = jax.nn.relu
    dtype: Optional[Dtype] = None
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, enc_outs, train: bool = False, low_res: bool = False):
        enc_out, skip_16, skip_8, skip_4 = enc_outs
        out, down_32 = DecoderModule(
            self.channels_decoder[0], self.nr_decoder_blocks[0], self.num_classes,
            self.upsampling_mode, self.encoder_decoder_fusion, self.activation,
            self.dtype, self.quant,
            name="decoder_module_1",
        )(enc_out, skip_16, train)
        out, down_16 = DecoderModule(
            self.channels_decoder[1], self.nr_decoder_blocks[1], self.num_classes,
            self.upsampling_mode, self.encoder_decoder_fusion, self.activation,
            self.dtype, self.quant,
            name="decoder_module_2",
        )(out, skip_8, train)
        out, down_8 = DecoderModule(
            self.channels_decoder[2], self.nr_decoder_blocks[2], self.num_classes,
            self.upsampling_mode, self.encoder_decoder_fusion, self.activation,
            self.dtype, self.quant,
            name="decoder_module_3",
        )(out, skip_4, train)

        out = torch_conv(
            self.num_classes, 3, padding=1, dtype=self.dtype, name="conv_out",
            quant=self.quant,
        )(out)
        if low_res and not train:
            # Serving fast path: return the H/4 logits and skip the two
            # 40-channel ×2 learned upsamples — the tail's dominant HBM
            # traffic (the bs=8 480×640 fp32 full-res logits map alone is
            # 196 MB). The caller argmaxes at H/4 and nearest-upsamples the
            # tiny uint8 class map on the host (predict.py --output_res
            # quarter). Eval/train keep full resolution (mIoU parity with
            # the reference's model.py:299-308 upsample-then-score chain).
            # NOTE: only valid on variables initialized with the default
            # full-res graph (upsample1/2 params exist but go unused).
            return out
        out = Upsample(
            mode=self.upsampling_mode, channels=self.num_classes,
            dtype=self.dtype, name="upsample1",
        )(out)
        out = Upsample(
            mode=self.upsampling_mode, channels=self.num_classes,
            dtype=self.dtype, name="upsample2",
        )(out)
        if train:
            return out, down_8, down_16, down_32
        return out


def build_encoder(cfg: ESANetConfig, which: str, name: str) -> ResNet:
    """RGB (3-ch) or depth (1-ch) encoder per the config."""
    return make_resnet(
        getattr(cfg, f"encoder_{which}"),
        block=cfg.encoder_block,
        input_channels=3 if which == "rgb" else 1,
        activation=cfg.act,
        dtype=cfg.dtype,
        module_name=name,
        remat=cfg.remat,
        s2d_stem=cfg.s2d_stem,
        quant=cfg.quant,
    )


class _DualEncoderParts(nn.Module):
    """Shared setup for the dual-encoder ESANet family: encoders, SE fusion
    cells, skip projections, context module and decoder. Subclasses/owners
    call the pieces; keeping them in one module fixes the param tree layout
    so the torch checkpoint importer is uniform across model variants.
    """

    cfg: ESANetConfig

    def setup(self):
        cfg = self.cfg
        self.encoder_rgb = build_encoder(cfg, "rgb", "encoder_rgb")
        self.encoder_depth = build_encoder(cfg, "depth", "encoder_depth")
        ch = self.encoder_rgb.down_channels

        if cfg.fuse_depth_in_rgb_encoder == "SE-add":
            for i, c in enumerate([64, ch[4], ch[8], ch[16], ch[32]]):
                setattr(
                    self,
                    f"se_layer{i}_mod",
                    SqueezeAndExciteFusionAdd(
                        c, activation=cfg.act, dtype=cfg.dtype,
                        name=f"se_layer{i}",
                    ),
                )

        cd = cfg.channels_decoder
        if cfg.encoder_decoder_fusion == "add":
            self.skip_layer1 = (
                ConvBNAct(cd[2], 1, activation=cfg.act, dtype=cfg.dtype,
                          quant=cfg.quant, name="skip_layer1")
                if ch[4] != cd[2] else None
            )
            self.skip_layer2 = (
                ConvBNAct(cd[1], 1, activation=cfg.act, dtype=cfg.dtype,
                          quant=cfg.quant, name="skip_layer2")
                if ch[8] != cd[1] else None
            )
            self.skip_layer3 = (
                ConvBNAct(cd[0], 1, activation=cfg.act, dtype=cfg.dtype,
                          quant=cfg.quant, name="skip_layer3")
                if ch[16] != cd[0] else None
            )
        else:
            self.skip_layer1 = self.skip_layer2 = self.skip_layer3 = None

        # learned-3x3 upsampling cannot upscale the non-×2 context maps
        context_upsampling = (
            "nearest" if "learned-3x3" in cfg.upsampling else cfg.upsampling
        )
        self.context_module, channels_after_context = get_context_module(
            cfg.context_module,
            ch[32],
            cd[0],
            input_size=(cfg.height // 32, cfg.width // 32),
            activation=cfg.act,
            upsampling_mode=context_upsampling,
            dtype=cfg.dtype,
        )
        self.decoder = Decoder(
            channels_decoder=cd,
            nr_decoder_blocks=cfg.nr_decoder_blocks,
            num_classes=cfg.num_classes,
            upsampling_mode=cfg.upsampling,
            encoder_decoder_fusion=cfg.encoder_decoder_fusion,
            activation=cfg.act,
            dtype=cfg.dtype,
            quant=cfg.quant,
            name="decoder",
        )

    # -- fusion helpers ----------------------------------------------------
    def fuse(self, idx: int, rgb, depth):
        if self.cfg.fuse_depth_in_rgb_encoder == "add":
            return rgb + depth
        return getattr(self, f"se_layer{idx}_mod")(rgb, depth)

    def skip(self, idx: int, fused, train: bool):
        layer = getattr(self, f"skip_layer{idx}")
        return fused if layer is None else layer(fused, train)

    def head(self, fused, skips, train: bool, low_res: bool = False):
        """Context module + decoder over the stage-4 fusion and skips 3..1."""
        out = (
            self.context_module(fused, train)
            if self.context_module is not None
            else fused
        )
        return self.decoder(
            [out, skips[2], skips[1], skips[0]], train, low_res=low_res
        )


class ESANet(_DualEncoderParts):
    """Static ESANet baseline (model.py:19-241): always fuse depth.

    Subclasses ``_DualEncoderParts`` so all parameters sit at the top of the
    tree under torch-like names (encoder_rgb, se_layer0.., decoder, ...).
    """

    def __call__(self, rgb, depth, train: bool = False, low_res: bool = False):
        p = self
        rgb = p.encoder_rgb.stem(rgb, train)
        depth = p.encoder_depth.stem(depth, train)
        if p.cfg.fuse_depth_in_rgb_encoder == "SE-add":
            rgb, depth = p.se_layer0_mod.fuse_and_pool(rgb, depth)
        else:
            fused = p.fuse(0, rgb, depth)
            rgb = max_pool_3x3_s2(fused)
            depth = max_pool_3x3_s2(depth)

        skips = []
        for i in (1, 2, 3, 4):
            rgb = getattr(p.encoder_rgb, f"layer{i}")(rgb, train)
            depth = getattr(p.encoder_depth, f"layer{i}")(depth, train)
            fused = p.fuse(i, rgb, depth)
            if i < 4:
                skips.append(p.skip(i, fused, train))
                rgb = fused
        return p.head(fused, skips, train, low_res=low_res)
