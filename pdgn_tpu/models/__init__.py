"""Model zoo: progressive generator + per-resolution discriminators."""

from pdgn_tpu.models.discriminator import (
    PointDiscriminator,
    PointDiscriminator1,
    PointDiscriminator2,
    PointDiscriminator3,
    PointDiscriminator4,
)
from pdgn_tpu.models.generator import (
    BilateralBlock,
    BilateralUpsampleEdgeConv,
    EdgeConv,
    PointGenerator,
    UpsampleEdgeConv,
)

__all__ = [
    "BilateralBlock",
    "BilateralUpsampleEdgeConv",
    "EdgeConv",
    "PointDiscriminator",
    "PointDiscriminator1",
    "PointDiscriminator2",
    "PointDiscriminator3",
    "PointDiscriminator4",
    "PointGenerator",
    "UpsampleEdgeConv",
]
