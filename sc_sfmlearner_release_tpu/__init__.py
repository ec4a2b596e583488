"""SC-SfMLearner TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for
scale-consistent self-supervised monocular depth and ego-motion learning.

Re-implements the capabilities of SC-DepthV1 (SC-SfMLearner) with a
TPU-first architecture: functional Flax models, a single fused XLA training
step, SPMD data parallelism over a `jax.sharding.Mesh`, and Pallas kernels
for the hot sampling ops.

Layout:
  ops/       differentiable geometry, grid sampling, SSIM, losses, metrics
  models/    DispNet / PoseNet (ResNet encoder-decoders) as Flax modules
  data/      dataset crawlers, intrinsics-aware augmentation, host pipeline
  parallel/  device mesh + sharding helpers
  training/  train state, fused train/eval steps, checkpointing
  utils/     visualization, meters, logging
"""

__version__ = "0.1.0"
