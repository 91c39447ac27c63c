"""Test-only omegaconf stub: the reference's utils/config.py imports
DictConfig solely for an isinstance() check (utils/config.py:143-145)."""


class DictConfig(dict):
    pass
