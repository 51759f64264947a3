"""Flax model layer: norm, blocks, UNet backbones, heads, panoptic models."""

from .norm import MaskedBatchNorm  # noqa: F401
from .modules import (  # noqa: F401
    SparseConv,
    ConvBNReLU,
    ResBlock,
    ResNetDown,
    ResNetUp,
    PointMLP,
)
from .unet import SparseUNet, SparseEncoder  # noqa: F401
from .plans import (  # noqa: F401
    paper_backbone_plan,
    scorer_unet_plan,
    scorer_encoder_plan,
    num_down_levels,
)
