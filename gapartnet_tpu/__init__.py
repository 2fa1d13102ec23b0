"""GAPartNet-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for cross-category
generalizable articulated-part perception, with the capabilities of PKU-EPIC/GAPartNet.

Layer map (mirrors reference SURVEY.md section 1, re-architected for TPU):
  ops/        L0  jitted fixed-shape ops + Pallas kernels (replaces spconv / epic_ops /
              pointnet2_cuda CUDA kernels)
  structures  L1  fixed-shape pytrees with validity masks (replaces torch dataclasses)
  data/       L2  .pth/.npz ingestion, augmentation, padded batching, host sharding
  models/     L3  flax SparseUNet backbone + heads + losses + clustering
  train/      L4  fit|test CLI with gapartnet.yaml-compatible config, orbax checkpoints
  infer/      L5  single-object inference API + RANSAC/Umeyama pose fitting
  datagen/    L6  render + process toolchain (SAPIEN-optional)
  parallel/   SPMD mesh + sharding helpers (replaces Lightning DDP / NCCL)
"""

__version__ = "0.1.0"
