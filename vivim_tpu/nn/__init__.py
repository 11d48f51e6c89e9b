"""Model layer: Mamba v3 mixer, SegFormer MiT-b3, Vivim assembly."""

from vivim_tpu.nn.layers import DropPath, DWConv3d, Mlp
from vivim_tpu.nn.mamba import MambaV3, MambaLayer
from vivim_tpu.nn.segformer import (
    SegformerConfig,
    SegformerEncoder,
    SegformerDecodeHead,
    SegformerForSemanticSegmentation,
    mit_b0,
    mit_b3,
)
from vivim_tpu.nn.moe import MoEMambaLM, MoEMambaLMConfig, SwitchFFN
from vivim_tpu.nn.vivim import Vivim, VivimConfig, VivimEncoder

__all__ = [
    "DropPath", "DWConv3d", "Mlp", "MambaV3", "MambaLayer",
    "SegformerConfig", "SegformerEncoder", "SegformerDecodeHead",
    "SegformerForSemanticSegmentation", "mit_b0", "mit_b3",
    "Vivim", "VivimConfig", "VivimEncoder",
    "MoEMambaLM", "MoEMambaLMConfig", "SwitchFFN",
]
