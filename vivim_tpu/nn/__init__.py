"""Model layer: Mamba v3 mixer, SegFormer MiT-b3, Vivim assembly."""

from vivim_tpu.nn.layers import DropPath, DWConv3d, Mlp
from vivim_tpu.nn.mamba import MambaV3, MambaLayer

__all__ = ["DropPath", "DWConv3d", "Mlp", "MambaV3", "MambaLayer"]
