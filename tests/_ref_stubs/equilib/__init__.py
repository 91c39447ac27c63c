"""Test-only equilib stub. The reference's panocam.py imports equi2pers and
grid_sample at module load; the forward-parity tests never call them (pano
sampling is exercised against this repo's own ops.pano instead)."""

__version__ = "0.3.0"  # panocam.py:8 asserts this exact version


def equi2pers(*args, **kwargs):
    raise NotImplementedError("equilib stub: not needed for forward parity")


def grid_sample(*args, **kwargs):
    raise NotImplementedError("equilib stub: not needed for forward parity")
