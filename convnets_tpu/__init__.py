"""convnets_tpu — a TPU-native (JAX/XLA/Pallas/pjit) image classification framework.

Re-implements, TPU-first, the full capability surface of the PyTorch ConvNets
reference collection (see SURVEY.md): an 11-architecture classic-CNN model zoo,
a shared training engine (mixed precision, Adam + plateau LR scheduling, early
stopping, gradient clipping, best-checkpoint gating/resume), random-search
hyper-parameter tuning, and an evaluation/benchmark suite.

Architecture (bottom-up):
  core/      dtype policy, PRNG plumbing, shape math
  ops/       the cuDNN-replacement layer: lax-backed ops + Pallas TPU kernels
  nn/        functional module system (pytree params, pure apply)
  models/    the model zoo (VGG ... SKNet) as config + pure apply fns
  data/      input pipeline: manifest datasets, on-device fused augmentation
  train/     engine: fit/evaluate/test, checkpoints, metrics
  parallel/  SPMD data parallelism over a jax.sharding.Mesh
  tune/      random-search tuner
  viz/       offline plotting
"""

__version__ = "0.1.0"

from convnets_tpu.settings import Settings, HyperParams, HyperParamsDistrib  # noqa: F401
