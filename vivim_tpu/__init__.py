"""vivim_tpu — a TPU-native video vision Mamba segmentation framework.

A ground-up JAX/XLA/Pallas/pjit re-design with the capabilities of the
reference CUDA/PyTorch project (Nicolo2277/Vivim): Video Vision Mamba
(SegFormer-b3 encoder interleaved with tri-directional temporal Mamba SSM
blocks) for multiclass medical video segmentation, with the full pipeline:
dataset curation, stratified k-fold splitting, clip datasets with
augmentation, training (focal+Tversky loss, AdamW+cosine), final retrain,
and inference with metrics/confusion matrices.

Subpackages
-----------
kernels   Pallas TPU kernels (selective scan, causal conv) + jnp references
nn        Model code (Mamba v3 mixer, SegFormer MiT-b3, Vivim)
data      Dataset gathering, k-fold splitting, clip windowing, augmentation
train     Losses, metrics, train loop, checkpointing
parallel  Mesh/sharding utilities
convert   PyTorch -> JAX weight conversion
"""

__version__ = "0.1.0"
