"""Pallas TPU kernels for the hot ops, each with an XLA fallback."""

from .decoder_tail import decoder_tail
from .fused_attention import fused_attention

__all__ = ["fused_attention", "decoder_tail"]
