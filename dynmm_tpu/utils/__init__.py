"""Utilities: CSV logging, checkpointing (native + PyTorch import), FLOP analysis."""
