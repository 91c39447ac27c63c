"""Minimal test-only stub of `timm` — just the three layers the reference
backbones import (mix_transformers.py:11, convnext.py:13)."""
