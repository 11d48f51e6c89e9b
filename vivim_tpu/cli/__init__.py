"""Command-line entry points (reference-compatible flags)."""
