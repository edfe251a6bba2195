"""PDGN-TPU: a TPU-native JAX framework for progressive point-cloud generation.

A from-scratch rebuild of the capabilities of fpthink/PDGN (ECCV 2020,
"Progressive Point Cloud Deconvolution Generation Network") designed for
TPU hardware: jit/pjit + sharding for parallelism, XLA/Pallas kernels for
the point ops and structural losses, channel-last layouts that map onto
the MXU, and a functional GAN train step.

Layout conventions (TPU-native, differs from the reference's CUDA layout):
  * point clouds are channel-last ``(B, N, 3)``
  * features are channel-last ``(B, N, C)``

Subpackages
-----------
ops       point operator library (knn, grouping, fps, interpolation, ...)
models    PointGenerator + PointDiscriminator_{1..4} (flax.linen)
losses    Chamfer, approximate EMD, LSGAN, shape-preserving statistics
data      ShapeNetCore / ModelNet / PartDataset loaders + augmentations
parallel  device-mesh utilities, cross-replica (sync) batch norm
train     GAN trainer, jitted train step, checkpointing
eval      MMD / COV / 1-NNA / JSD metric suite
"""

__version__ = "0.1.0"

from pdgn_tpu import ops  # noqa: F401
