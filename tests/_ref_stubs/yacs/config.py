"""Test-only CfgNode stub (see package docstring)."""

import copy

import yaml


class CfgNode(dict):
    """dict with attribute access + the small yacs surface the reference uses."""

    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict=None):
        init_dict = init_dict or {}
        super().__init__()
        for k, v in init_dict.items():
            self[k] = self._to_node(v)
        self.__dict__[CfgNode.IMMUTABLE] = False

    @classmethod
    def _to_node(cls, v):
        if isinstance(v, dict) and not isinstance(v, CfgNode):
            return cls(v)
        return v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        if self.__dict__.get(CfgNode.IMMUTABLE, False):
            raise AttributeError(f"CfgNode is frozen; cannot set {name}")
        self[name] = self._to_node(value)

    def freeze(self):
        self.__dict__[CfgNode.IMMUTABLE] = True
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()

    def defrost(self):
        self.__dict__[CfgNode.IMMUTABLE] = False
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()

    def clone(self):
        return copy.deepcopy(self)

    def merge_from_file(self, cfg_filename):
        with open(cfg_filename) as f:
            other = yaml.safe_load(f)
        self._merge(other or {})

    def merge_from_other_cfg(self, other):
        self._merge(other)

    def _merge(self, other):
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), CfgNode):
                self[k]._merge(v)
            else:
                self[k] = self._to_node(v)
