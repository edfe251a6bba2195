"""Pallas TPU kernels for the hot ops.

These are the native-kernel equivalents of the reference's CUDA kernels
(lib/pointops + pytorch_structural_losses). Pure-jnp reference
implementations live next to them in pdgn_tpu.ops / pdgn_tpu.losses and
serve as the test oracles; the Pallas paths are used on TPU when shapes
allow, with automatic fallback otherwise.
"""

from pdgn_tpu.ops.pallas.emd_cd import fused_cd_emd

__all__ = ["fused_cd_emd"]
