"""Training layer: losses, metrics, train step/loop, checkpointing, logging."""
