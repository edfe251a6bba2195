"""PointNet-style per-resolution discriminators.

TPU-native equivalents of reference ``PointDiscriminator_{1..4}``
(models/PDGNet_v2.py:882-1023): a shared 1x1-conv MLP (Dense over the
channel-last lane axis) + BN + LeakyReLU, a global max-pool over the point
axis, and an FC head to a single logit. One discriminator per resolution
(256 / 512 / 1024 / 2048 points) with widths:

  D1: 3-64-128-256        head 256-128-64-1
  D2: 3-64-128-256-512    head 512-256-64-1
  D3: 3-64-128-256-512    head 512-256-64-1
  D4: 3-64-128-256-1024   head 1024-512-256-64-1
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pdgn_tpu.models.layers import (DenseBR, DenseBRPool, TorchDense,
                                    leaky_relu)


class PointDiscriminator(nn.Module):
    """Shared implementation parameterised by the conv/head widths.

    ``dtype`` (e.g. ``bfloat16``) applies to the large per-point conv
    stack only — BN statistics, the pooled vector and the FC head stay
    fp32, mirroring the generator's compute-dtype policy.
    """

    conv_features: Sequence[int]
    head_features: Sequence[int]
    axis_name: Optional[str] = None
    dtype: Optional[str] = None
    # paired mode: accept a stacked ``(2, B, N, 3)`` real|fake input and
    # evaluate both halves in one pass with *independent* per-half BN
    # statistics — the same math as two sequential calls (the reference's
    # D(real); D(fake) order, models/PDGNet_v2.py:716-739) in half the
    # kernel dispatches. Parameter/stat trees are identical either way.
    paired: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """``x (B, N, 3)`` -> logits ``(B, 1)``; paired mode maps
        ``(2, B, N, 3)`` -> ``(2, B, 1)``."""
        p = self.paired and x.ndim == 4
        for i, f in enumerate(self.conv_features[:-1]):
            x = DenseBR(f, negative_slope=0.01, axis_name=self.axis_name,
                        dtype=self.dtype, paired=p, name=f"conv{i+1}")(x)
        # last conv + BN + LeakyReLU + global max fused: the pool commutes
        # with the monotone per-channel affine, so the widest activation
        # is reduced straight from the GEMM (see DenseBRPool)
        x = DenseBRPool(self.conv_features[-1], negative_slope=0.01,
                        axis_name=self.axis_name, dtype=self.dtype,
                        paired=p,
                        name=f"conv{len(self.conv_features)}")(x)
        x = x.astype(jnp.float32)
        for i, f in enumerate(self.head_features[:-1]):
            x = TorchDense(f, name=f"fc{i+1}")(x)
            x = leaky_relu(x)
        return TorchDense(self.head_features[-1], name="fc_out")(x)


def PointDiscriminator1(axis_name: Optional[str] = None,
                        dtype: Optional[str] = None) -> PointDiscriminator:
    """256-point discriminator (reference models/PDGNet_v2.py:882-913)."""
    return PointDiscriminator((64, 128, 256), (128, 64, 1), axis_name, dtype)


def PointDiscriminator2(axis_name: Optional[str] = None,
                        dtype: Optional[str] = None) -> PointDiscriminator:
    """512-point discriminator (reference models/PDGNet_v2.py:915-949)."""
    return PointDiscriminator((64, 128, 256, 512), (256, 64, 1), axis_name,
                              dtype)


def PointDiscriminator3(axis_name: Optional[str] = None,
                        dtype: Optional[str] = None) -> PointDiscriminator:
    """1024-point discriminator (reference models/PDGNet_v2.py:951-985)."""
    return PointDiscriminator((64, 128, 256, 512), (256, 64, 1), axis_name,
                              dtype)


def PointDiscriminator4(axis_name: Optional[str] = None,
                        dtype: Optional[str] = None) -> PointDiscriminator:
    """2048-point discriminator (reference models/PDGNet_v2.py:987-1023)."""
    return PointDiscriminator((64, 128, 256, 1024), (512, 256, 64, 1),
                              axis_name, dtype)
