"""Numerical parity of model building blocks vs torch functional oracles.

Each test initializes the flax module with random params, replays the same
computation with torch.nn.functional primitives (per the documented reference
architecture), and compares. Run in f32 with highest matmul precision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

jax.config.update("jax_default_matmul_precision", "highest")

ATOL = 2e-5


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _conv_w(kernel):
    # flax HWIO -> torch OIHW
    return _t(np.transpose(np.asarray(kernel), (3, 2, 0, 1)))


def _lin_w(kernel):
    return _t(np.transpose(np.asarray(kernel), (1, 0)))


def _nchw(x):
    return _t(np.asarray(x)).permute(0, 3, 1, 2)


def _nhwc(x):
    return x.permute(0, 2, 3, 1).numpy()


def test_sr_attention_matches_torch():
    from perspectivefields_tpu.models.mit import SRAttention

    rng = np.random.default_rng(0)
    b, h, w, c, heads, sr = 2, 8, 8, 16, 2, 2
    x = rng.normal(size=(b, h, w, c)).astype(np.float32)
    mod = SRAttention(dim=c, num_heads=heads, sr_ratio=sr)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(jax.jit(mod.apply)(params, jnp.asarray(x)))

    p = params["params"]
    xt = _t(x).reshape(b, h * w, c)
    q = F.linear(xt, _lin_w(p["q"]["kernel"]), _t(p["q"]["bias"]))
    q = q.reshape(b, h * w, heads, c // heads).permute(0, 2, 1, 3)
    x_ = xt.permute(0, 2, 1).reshape(b, c, h, w)
    x_ = F.conv2d(x_, _conv_w(p["sr"]["kernel"]), _t(p["sr"]["bias"]), stride=sr)
    x_ = x_.reshape(b, c, -1).permute(0, 2, 1)
    x_ = F.layer_norm(x_, (c,), _t(p["norm"]["scale"]), _t(p["norm"]["bias"]), eps=1e-6)
    kv = F.linear(x_, _lin_w(p["kv"]["kernel"]), _t(p["kv"]["bias"]))
    kv = kv.reshape(b, -1, 2, heads, c // heads).permute(2, 0, 3, 1, 4)
    k, v = kv[0], kv[1]
    attn = (q @ k.transpose(-2, -1)) * (c // heads) ** -0.5
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(b, h * w, c)
    out = F.linear(out, _lin_w(p["proj"]["kernel"]), _t(p["proj"]["bias"]))
    want = out.reshape(b, h, w, c).numpy()
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_mixffn_matches_torch():
    from perspectivefields_tpu.models.mit import MixFFN

    rng = np.random.default_rng(1)
    b, h, w, c, hidden = 2, 6, 5, 8, 32
    x = rng.normal(size=(b, h, w, c)).astype(np.float32)
    mod = MixFFN(hidden_dim=hidden, out_dim=c)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(jax.jit(mod.apply)(params, jnp.asarray(x)))

    p = params["params"]
    xt = _t(x).reshape(b, h * w, c)
    y = F.linear(xt, _lin_w(p["fc1"]["kernel"]), _t(p["fc1"]["bias"]))
    y = y.transpose(1, 2).reshape(b, hidden, h, w)
    y = F.conv2d(
        y, _conv_w(p["dwconv"]["kernel"]), _t(p["dwconv"]["bias"]), padding=1, groups=hidden
    )
    y = y.flatten(2).transpose(1, 2)
    y = F.gelu(y)
    y = F.linear(y, _lin_w(p["fc2"]["kernel"]), _t(p["fc2"]["bias"]))
    want = y.reshape(b, h, w, c).numpy()
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_patch_embed_matches_torch():
    from perspectivefields_tpu.models.mit import OverlapPatchEmbed

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    mod = OverlapPatchEmbed(dim=16, patch_size=7, stride=4)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(jax.jit(mod.apply)(params, jnp.asarray(x)))

    p = params["params"]
    y = F.conv2d(_nchw(x), _conv_w(p["proj"]["kernel"]), _t(p["proj"]["bias"]), stride=4, padding=3)
    b, c, h, w = y.shape
    y = y.flatten(2).transpose(1, 2)
    y = F.layer_norm(y, (c,), _t(p["norm"]["scale"]), _t(p["norm"]["bias"]), eps=1e-6)
    want = y.reshape(b, h, w, c).numpy()
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_convnext_block_matches_torch():
    from perspectivefields_tpu.models.convnext import ConvNeXtBlock

    rng = np.random.default_rng(3)
    c = 16
    x = rng.normal(size=(2, 8, 8, c)).astype(np.float32)
    mod = ConvNeXtBlock(dim=c)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomize gamma so the test is not trivially scale-invariant
    params = jax.tree.map(lambda a: a, params)
    got = np.asarray(jax.jit(mod.apply)(params, jnp.asarray(x)))

    p = params["params"]
    inp = _nchw(x)
    y = F.conv2d(inp, _conv_w(p["dwconv"]["kernel"]), _t(p["dwconv"]["bias"]), padding=3, groups=c)
    y = y.permute(0, 2, 3, 1)
    y = F.layer_norm(y, (c,), _t(p["norm"]["scale"]), _t(p["norm"]["bias"]), eps=1e-6)
    y = F.linear(y, _lin_w(p["pwconv1"]["kernel"]), _t(p["pwconv1"]["bias"]))
    y = F.gelu(y)
    y = F.linear(y, _lin_w(p["pwconv2"]["kernel"]), _t(p["pwconv2"]["bias"]))
    y = _t(p["gamma"]) * y
    y = y.permute(0, 3, 1, 2)
    want = (inp + y).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_lowlevel_encoder_matches_torch_bn_eval():
    from perspectivefields_tpu.models.heads import LowLevelEncoder

    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)
    mod = LowLevelEncoder(feat_dim=8)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # non-trivial BN statistics
    import flax

    p = flax.core.unfreeze(params)["params"]
    p["bn1"]["mean"] = rng.normal(size=8).astype(np.float32) * 0.1
    p["bn1"]["var"] = (rng.uniform(0.5, 2.0, size=8)).astype(np.float32)
    p["bn1"]["scale"] = rng.normal(size=8).astype(np.float32)
    p["bn1"]["bias"] = rng.normal(size=8).astype(np.float32)
    params = {"params": p}
    got = np.asarray(jax.jit(mod.apply)(params, jnp.asarray(x)))

    y = F.conv2d(_nchw(x), _conv_w(p["conv1"]["kernel"]), None, stride=2, padding=3)
    y = F.batch_norm(
        y,
        _t(p["bn1"]["mean"]),
        _t(p["bn1"]["var"]),
        _t(p["bn1"]["scale"]),
        _t(p["bn1"]["bias"]),
        training=False,
        eps=1e-5,
    )
    want = F.relu(y).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_residual_conv_unit_matches_torch():
    from perspectivefields_tpu.models.heads import ResidualConvUnit

    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 8, 8, 16)).astype(np.float32)
    mod = ResidualConvUnit(features=16)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(jax.jit(mod.apply)(params, jnp.asarray(x)))

    p = params["params"]
    inp = _nchw(x)
    # the reference RCU's inplace ReLU (decode_head.py:242) rectifies the
    # skip input too: residual = out + relu(x), not out + x
    skip = F.relu(inp)
    y = F.conv2d(skip, _conv_w(p["conv1"]["kernel"]), _t(p["conv1"]["bias"]), padding=1)
    y = F.relu(y)
    y = F.conv2d(y, _conv_w(p["conv2"]["kernel"]), _t(p["conv2"]["bias"]), padding=1)
    want = (y + skip).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_fusion_block_upsamples_2x():
    from perspectivefields_tpu.models.heads import FeatureFusionBlock

    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
    lat = rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
    mod = FeatureFusionBlock(features=8)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(lat))
    out = np.asarray(jax.jit(mod.apply)(params, jnp.asarray(x), jnp.asarray(lat)))
    assert out.shape == (1, 8, 8, 8)


def test_persnet_output_contract():
    """Full tiny model: shapes + regression-head invariants."""
    from perspectivefields_tpu.config import (
        BackboneConfig,
        GravityHeadConfig,
        LatitudeHeadConfig,
        ModelConfig,
        ParamNetConfig,
    )
    from perspectivefields_tpu.models import PersNet

    cfg = ModelConfig(
        backbone=BackboneConfig(dims=(8, 16, 24, 32), depths=(1, 1, 1, 1), num_heads=(1, 2, 3, 4)),
        gravity=GravityHeadConfig(loss_type="regression", embed_dim=16, fusion_dim=16),
        latitude=LatitudeHeadConfig(loss_type="regression", embed_dim=16, fusion_dim=16),
        param=ParamNetConfig(
            name="ParamNetConvNextRegress",
            predict_params=("roll", "pitch", "general_vfov", "rel_cx", "rel_cy"),
            input_size=32,
        ),
        recover_rpf=True,
        recover_pp=True,
    )
    model = PersNet(cfg)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(2, 64, 64, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(params, x)
    assert out["pred_gravity"].shape == (2, 64, 64, 2)
    assert out["pred_latitude"].shape == (2, 64, 64, 1)
    # gravity unit-norm invariant
    norms = np.linalg.norm(np.asarray(out["pred_gravity"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # latitude clamped
    lat = np.asarray(out["pred_latitude"])
    assert lat.min() >= -1.0 and lat.max() <= 1.0
    for k in ("pred_roll", "pred_pitch", "pred_general_vfov", "pred_rel_cx",
              "pred_rel_cy", "pred_rel_focal"):
        assert out[k].shape == (2,), k


def test_mit_family_specs():
    from perspectivefields_tpu.models import mit_spec

    for name, dims0, depth2 in [
        ("mitb0", 32, 2), ("mitb1", 64, 2), ("mitb2", 64, 6),
        ("mitb3", 64, 18), ("mitb4", 64, 27), ("mitb5", 64, 40),
    ]:
        spec = mit_spec(name)
        assert spec.dims[0] == dims0 and spec.depths[2] == depth2
        assert len(spec.dims) == len(spec.depths) == len(spec.num_heads) == 4
    import pytest

    with pytest.raises(ValueError):
        mit_spec("mitb9")
