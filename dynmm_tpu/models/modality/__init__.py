"""Modality-level DynMM: sample-wise expert-branch routing.

Model families:
* ``mmdl``   — generic encoders+fusion+head multimodal model
* ``imdb``   — MM-IMDB text vs. image+text late-fusion router
* ``affect`` — CMU-MOSEI text vs. tri-modal transformer router
"""

from dynmm_tpu.models.modality.mmdl import MMDL
from dynmm_tpu.models.modality.imdb import IMDBDynMMNet, IMDB_FLOPS_M
from dynmm_tpu.models.modality.affect import (
    MoseiDynMMNetV2,
    MoseiTriBranchDynMMNet,
    MOSEI_FLOPS_M,
)

__all__ = [
    "MMDL",
    "IMDBDynMMNet",
    "IMDB_FLOPS_M",
    "MoseiDynMMNetV2",
    "MoseiTriBranchDynMMNet",
    "MOSEI_FLOPS_M",
]
