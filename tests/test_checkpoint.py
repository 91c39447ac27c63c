"""Checkpoint converter: name-map round trip + layout transposes."""

import numpy as np
import pytest

from perspectivefields_tpu.checkpoint import (
    convert_torch_state_dict,
    flax_to_torch_names,
)
from perspectivefields_tpu.checkpoint.io import load_params, save_params
from perspectivefields_tpu.config import (
    BackboneConfig,
    GravityHeadConfig,
    LatitudeHeadConfig,
    ModelConfig,
    ParamNetConfig,
)


@pytest.fixture(scope="module")
def tiny_params():
    import jax
    import jax.numpy as jnp

    from perspectivefields_tpu.models import PersNet

    cfg = ModelConfig(
        backbone=BackboneConfig(dims=(8, 16, 24, 32), depths=(1, 2, 1, 1), num_heads=(1, 2, 3, 4)),
        gravity=GravityHeadConfig(loss_type="regression", embed_dim=16, fusion_dim=16),
        latitude=LatitudeHeadConfig(loss_type="classification", num_classes=180, embed_dim=16, fusion_dim=16),
        param=ParamNetConfig(
            name="ParamNetConvNextRegress",
            predict_params=("roll", "pitch", "general_vfov", "rel_cx", "rel_cy"),
            input_size=32,
        ),
        recover_rpf=True,
        recover_pp=True,
    )
    model = PersNet(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    return jax.jit(model.init)(jax.random.PRNGKey(0), x)


def _tree_equal(a, b, path=""):
    assert set(a.keys()) == set(b.keys()), (
        f"key mismatch at {path}: {sorted(a.keys())} vs {sorted(b.keys())}"
    )
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=f"{path}/{k}")


def test_roundtrip_flax_torch_flax(tiny_params):
    sd = flax_to_torch_names(tiny_params)
    # all names look like reference names
    for name in sd:
        assert not name.startswith("params"), name
        root = name.split(".")[0]
        assert root in ("backbone", "ll_enc", "persformer_heads", "param_net"), name
    back = convert_torch_state_dict(sd)
    _tree_equal(tiny_params["params"], back["params"])


def test_expected_reference_names_present(tiny_params):
    sd = flax_to_torch_names(tiny_params)
    expected = [
        "backbone.patch_embed1.proj.weight",
        "backbone.patch_embed1.norm.bias",
        "backbone.block1.0.attn.q.weight",
        "backbone.block1.0.attn.kv.weight",
        "backbone.block1.0.attn.sr.weight",
        "backbone.block1.0.attn.norm.weight",
        "backbone.block2.1.mlp.dwconv.dwconv.weight",
        "backbone.block1.0.mlp.fc1.bias",
        "backbone.norm4.weight",
        "ll_enc.conv1.weight",
        "ll_enc.bn1.running_mean",
        "persformer_heads.gravity_head.linear_c4.proj.weight",
        "persformer_heads.gravity_head.linear_c1_proc.weight",
        "persformer_heads.gravity_head.fusion3.resConfUnit1.conv1.weight",
        "persformer_heads.gravity_head.conv_fuse_conv0.conv.weight",
        "persformer_heads.gravity_head.linear_pred_gravity.weight",
        "persformer_heads.latitude_head.linear_pred_latitude.weight",
        "param_net.backbone.downsample_layers.0.0.weight",
        "param_net.backbone.downsample_layers.1.1.weight",
        "param_net.backbone.stages.0.0.dwconv.weight",
        "param_net.backbone.stages.0.0.gamma",
        "param_net.backbone.stages.0.0.pwconv1.weight",
        "param_net.backbone.norm.weight",
        "param_net.backbone.head.weight",
    ]
    for name in expected:
        assert name in sd, f"missing {name}"


def test_conv_layout_transpose(tiny_params):
    sd = flax_to_torch_names(tiny_params)
    w = sd["backbone.patch_embed1.proj.weight"]
    assert w.shape == (8, 3, 7, 7)  # torch OIHW
    back = convert_torch_state_dict({"backbone.patch_embed1.proj.weight": w})
    k = back["params"]["backbone"]["patch_embed1"]["proj"]["kernel"]
    assert k.shape == (7, 7, 3, 8)  # flax HWIO


def test_npz_roundtrip(tiny_params, tmp_path):
    p = str(tmp_path / "params.npz")
    save_params(tiny_params, p)
    loaded = load_params(p)
    _tree_equal(tiny_params["params"], loaded["params"])


def test_pth_loads_on_the_fly(tiny_params, tmp_path):
    """A reference-style .pth (with the {'model': ...} envelope) converts at
    load time — the api path PerspectiveFields(params='x.pth') relies on it."""
    torch = pytest.importorskip("torch")

    sd = flax_to_torch_names(tiny_params)
    p = str(tmp_path / "ckpt.pth")
    torch.save({"model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}}, p)

    from perspectivefields_tpu.checkpoint.torch_convert import load_torch_checkpoint

    back = load_torch_checkpoint(p)
    _tree_equal(tiny_params["params"], back["params"])
