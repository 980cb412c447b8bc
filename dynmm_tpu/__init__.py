"""dynmm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) dynamic multimodal fusion framework.

From-scratch rebuild of the capabilities of zihuixue/DynMM ("Dynamic Multimodal
Fusion", MULA@CVPR 2023): input-dependent multimodal fusion where a small gating
network decides per sample which expert branch to run (modality-level DynMM) or
how many cross-modal fusion stages to execute (fusion-level DynMM), trading
accuracy against FLOPs via a resource-regularized loss.

Sub-packages
------------
core      gates (DiffSoftmax / Gumbel straight-through), temperature schedules,
          resource losses, gate statistics
nn        neural building blocks (conv/BN/SE, MLPs, transformers, GRUs, fusions)
models    model zoo: ESANet family (static / skip-gate / local-gate / unimodal),
          modality-level DynMM nets (MM-IMDB, CMU-MOSEI), generic MMDL
data      input pipelines: NYUv2 RGB-D segmentation, MM-IMDB features,
          CMU-MOSEI sequences; augmentation and noise-robustness injection
train     training loops, losses, metrics, LR/temperature schedules, logging
utils     checkpointing (native + PyTorch import), FLOP analysis, CSV logging
parallel  device-mesh/sharding helpers (pjit data/model parallelism)
kernels   Pallas TPU kernels for the hot fused ops
"""

__version__ = "0.1.0"
