"""Pallas TPU kernels for the hot ops, each with an XLA fallback."""

from .decoder_tail import decoder_tail
from .sr_attention import sr_attention

__all__ = ["sr_attention", "decoder_tail"]
