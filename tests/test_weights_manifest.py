"""Weights manifest (weights/MANIFEST.json) + fetch-time validation.

The released checkpoints are unreachable offline, but the validation gate
that will judge them must be proven now: a download whose tensor inventory
matches the reference graph passes (and pins its sha256 on first sight); a
truncated, renamed, reshaped, or bit-flipped file is rejected.
"""

import importlib.util
import json
import os
import shutil
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
MANIFEST = os.path.join(
    REPO, "perspectivefields_tpu", "weights", "MANIFEST.json"
)
VERSION = "Paramnet-360Cities-edina-centered"


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "fetch_and_verify", os.path.join(REPO, "tools", "fetch_and_verify.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def manifest():
    with open(MANIFEST) as f:
        return json.load(f)


def test_manifest_covers_zoo(manifest):
    from perspectivefields_tpu.config import model_zoo

    assert set(manifest) == set(model_zoo)
    for version, entry in manifest.items():
        assert entry["weights_url"] == model_zoo[version].get("weights_url")
        assert entry["tensor_count"] == len(entry["tensors"]) > 500


def test_manifest_matches_converter_export(manifest):
    """Our flax->torch exporter must produce exactly the manifest's names
    and shapes (modulo torch BN counters) — i.e. the manifest, the
    converter, and the reference graph agree on the weight schema."""
    import warnings

    import numpy as np

    from perspectivefields_tpu import PerspectiveFields
    from perspectivefields_tpu.checkpoint import flax_to_torch_names

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ours = PerspectiveFields(VERSION, compute_dtype="float32")
    exported = {
        k: list(np.shape(v)) for k, v in flax_to_torch_names(ours.params).items()
    }
    want = manifest[VERSION]["tensors"]
    skippable = lambda k: k.endswith("num_batches_tracked")  # noqa: E731
    assert not [k for k in exported if k not in want]
    assert not [k for k in want if k not in exported and not skippable(k)]
    wrong = [k for k in exported if exported[k] != want[k]]
    assert not wrong, wrong[:5]


def _fake_pth(manifest, path, mutate=None):
    import torch

    sd = {
        k: torch.zeros(s) for k, s in manifest[VERSION]["tensors"].items()
    }
    if mutate:
        mutate(sd)
    torch.save({"model": sd}, path)


def test_validation_pass_pin_and_tamper(tmp_path, manifest, monkeypatch):
    tool = _load_tool()
    # redirect the manifest so the pin rewrite never touches the repo copy
    mcopy = str(tmp_path / "MANIFEST.json")
    shutil.copy(MANIFEST, mcopy)
    monkeypatch.setattr(tool, "MANIFEST", mcopy)

    good = str(tmp_path / "good.pth")
    _fake_pth(manifest, good)
    tool.validate_against_manifest(VERSION, good)  # inventory ok, pins sha
    with open(mcopy) as f:
        pinned = json.load(f)[VERSION]["pth_sha256"]
    assert pinned, "sha256 was not pinned on first verified download"
    tool.validate_against_manifest(VERSION, good)  # now enforced, still ok

    # bit-flip: same inventory, different bytes -> sha mismatch, and the
    # pin check fires BEFORE the file is ever parsed (torch.load on a
    # tampered pickle is the attack the gate exists to stop)
    bad = str(tmp_path / "bad.pth")

    def flip(sd):
        k = "param_net.backbone.head.bias"
        sd[k] = sd[k] + 1.0

    _fake_pth(manifest, bad, mutate=flip)
    import torch as _torch

    def _no_load(*a, **k):
        raise AssertionError("torch.load reached before sha check")

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(_torch, "load", _no_load)
        with pytest.raises(SystemExit, match="sha256 mismatch"):
            tool.validate_against_manifest(VERSION, bad)

    # inventory tampering is the first-download guard: test it on an
    # UNPINNED manifest (once a sha is pinned, any byte change already
    # fails the hash before the inventory is read)
    def unpin():
        with open(mcopy) as f:
            m = json.load(f)
        m[VERSION].pop("pth_sha256", None)
        with open(mcopy, "w") as f:
            json.dump(m, f)

    # wrong shape
    unpin()
    shp = str(tmp_path / "shape.pth")

    def reshape(sd):
        import torch

        sd["param_net.backbone.head.weight"] = torch.zeros(3, 768)

    _fake_pth(manifest, shp, mutate=reshape)
    with pytest.raises(SystemExit, match="does not match"):
        tool.validate_against_manifest(VERSION, shp)

    # missing tensor
    unpin()
    mis = str(tmp_path / "missing.pth")
    _fake_pth(manifest, mis, mutate=lambda sd: sd.pop("backbone.block1.0.attn.q.bias"))
    with pytest.raises(SystemExit, match="does not match"):
        tool.validate_against_manifest(VERSION, mis)
