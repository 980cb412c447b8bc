"""ESANetOneModality — single-encoder (rgb-only or depth-only) baseline
(reference ``FusionDynMM/src/models/model_one_modality.py:19-193``): one
ResNet encoder, optional per-stage SqueezeAndExcitation recalibration
(``weighting_in_encoder == 'SE-add'``), same skip/context/decoder stack as
the dual-encoder family.
"""

from __future__ import annotations

import flax.linen as nn
import jax

from dynmm_tpu.models.context import get_context_module
from dynmm_tpu.models.esanet import Decoder, ESANetConfig
from dynmm_tpu.models.resnet import make_resnet
from dynmm_tpu.nn.layers import ConvBNAct, SqueezeAndExcitation, max_pool_3x3_s2


class ESANetOneModality(nn.Module):
    cfg: ESANetConfig
    input_channels: int = 3
    weighting_in_encoder: str = "None"

    def setup(self):
        cfg = self.cfg
        self.encoder = make_resnet(
            cfg.encoder_rgb,
            block=cfg.encoder_block,
            input_channels=self.input_channels,
            activation=cfg.act,
            dtype=cfg.dtype,
            module_name="encoder",
        )
        ch = self.encoder.down_channels
        if self.weighting_in_encoder == "SE-add":
            self.se_layers = [
                SqueezeAndExcitation(
                    c, activation=cfg.act, dtype=cfg.dtype, name=f"se_layer{i}"
                )
                for i, c in enumerate([64, ch[4], ch[8], ch[16], ch[32]])
            ]
        else:
            self.se_layers = None

        cd = cfg.channels_decoder
        self.skip_layer1 = (
            ConvBNAct(cd[2], 1, activation=cfg.act, dtype=cfg.dtype, name="skip_layer1")
            if ch[4] != cd[2] else None
        )
        self.skip_layer2 = (
            ConvBNAct(cd[1], 1, activation=cfg.act, dtype=cfg.dtype, name="skip_layer2")
            if ch[8] != cd[1] else None
        )
        self.skip_layer3 = (
            ConvBNAct(cd[0], 1, activation=cfg.act, dtype=cfg.dtype, name="skip_layer3")
            if ch[16] != cd[0] else None
        )
        context_upsampling = (
            "nearest" if "learned-3x3" in cfg.upsampling else cfg.upsampling
        )
        self.context_module, channels_after = get_context_module(
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
            name="decoder",
        )

    def _se(self, i, x):
        return self.se_layers[i](x) if self.se_layers is not None else x

    def __call__(self, image, train: bool = False, low_res: bool = False):
        out = self.encoder.stem(image, train)
        out = self._se(0, out)
        out = max_pool_3x3_s2(out)

        skips = []
        for i in (1, 2, 3, 4):
            out = getattr(self.encoder, f"layer{i}")(out, train)
            out = self._se(i, out)
            if i < 4:
                layer = getattr(self, f"skip_layer{i}")
                skips.append(out if layer is None else layer(out, train))

        if self.context_module is not None:
            out = self.context_module(out, train)
        return self.decoder(
            [out, skips[2], skips[1], skips[0]], train, low_res=low_res
        )
