"""Test-only torchvision stub: panocam.py:15 imports `transforms` at module
load but the forward-parity tests never use it."""

from . import transforms  # noqa: F401
