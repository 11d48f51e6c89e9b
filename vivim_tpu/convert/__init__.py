"""PyTorch -> JAX weight conversion (HF SegFormer checkpoints, reference
Lightning .ckpt files)."""
