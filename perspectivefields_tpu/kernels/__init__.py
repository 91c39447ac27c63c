"""Pallas TPU kernels for the hot ops, each with an XLA fallback."""

from .sr_attention import sr_attention

__all__ = ["sr_attention"]
