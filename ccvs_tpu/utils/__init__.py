"""Utilities: video IO, checkpointing, logging."""
