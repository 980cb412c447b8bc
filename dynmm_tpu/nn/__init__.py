"""Neural building blocks (flax.linen, NHWC layout, torch-import-compatible)."""

from dynmm_tpu.nn.layers import (
    ConvBNAct,
    ConvBN,
    SqueezeAndExcitation,
    SqueezeAndExcitationWeight,
    SqueezeAndExciteFusionAdd,
    SqueezeAndExciteReweigh,
    Upsample,
    get_activation,
    max_pool_3x3_s2,
)

__all__ = [
    "ConvBNAct",
    "ConvBN",
    "SqueezeAndExcitation",
    "SqueezeAndExcitationWeight",
    "SqueezeAndExciteFusionAdd",
    "SqueezeAndExciteReweigh",
    "Upsample",
    "get_activation",
    "max_pool_3x3_s2",
]
