"""Multi-device tests on the 8-device virtual CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perspectivefields_tpu.config import (
    BackboneConfig,
    GravityHeadConfig,
    LatitudeHeadConfig,
    ModelConfig,
    ParamNetConfig,
)
from perspectivefields_tpu.models import PersNet
from perspectivefields_tpu.parallel import (
    make_mesh,
    param_shardings,
    shard_batch,
    sharded_forward,
)


def tiny_cfg(**kw):
    return ModelConfig(
        backbone=BackboneConfig(dims=(8, 16, 24, 32), depths=(1, 1, 1, 1), num_heads=(1, 2, 3, 4)),
        gravity=GravityHeadConfig(loss_type="regression", embed_dim=16, fusion_dim=16),
        latitude=LatitudeHeadConfig(loss_type="regression", embed_dim=16, fusion_dim=16),
        **kw,
    )


@pytest.fixture(scope="module")
def tiny_model_and_params():
    cfg = tiny_cfg()
    model = PersNet(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, params


def test_eight_devices_available():
    assert jax.device_count() == 8


def test_data_parallel_forward_matches_single(tiny_model_and_params):
    model, params = tiny_model_and_params
    mesh = make_mesh(n_data=8, n_model=1)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 64, 64, 3)), jnp.float32)

    single = jax.jit(model.apply)(params, x)
    with mesh:
        fn, sparams = sharded_forward(model, mesh, params)
        xs = shard_batch(mesh, x)
        sharded = fn(sparams, xs)
    for k in single:
        np.testing.assert_allclose(
            np.asarray(single[k]), np.asarray(sharded[k]), atol=5e-4, err_msg=k
        )


def test_tensor_parallel_forward_matches_single(tiny_model_and_params):
    model, params = tiny_model_and_params
    mesh = make_mesh(n_data=4, n_model=2)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 64, 64, 3)), jnp.float32)

    single = jax.jit(model.apply)(params, x)
    with mesh:
        fn, sparams = sharded_forward(model, mesh, params)
        sharded = fn(sparams, shard_batch(mesh, x))
    for k in single:
        np.testing.assert_allclose(
            np.asarray(single[k]), np.asarray(sharded[k]), atol=5e-4, err_msg=k
        )


def test_tp_rules_shard_big_kernels(tiny_model_and_params):
    _, params = tiny_model_and_params
    mesh = make_mesh(n_data=4, n_model=2)
    shardings = param_shardings(mesh, params)
    # fc1 kernel should be model-sharded on its output dim
    s = shardings["params"]["backbone"]["block1_0"]["mlp"]["fc1"]["kernel"]
    assert s.spec == jax.sharding.PartitionSpec(None, "model")
    # patch embed conv stays replicated
    s2 = shardings["params"]["backbone"]["patch_embed1"]["proj"]["kernel"]
    assert s2.spec == jax.sharding.PartitionSpec()


def test_train_step_dp_tp_runs_and_descends():
    from perspectivefields_tpu.train import create_train_state, make_train_step

    cfg = tiny_cfg(
        param=ParamNetConfig(
            name="ParamNetConvNextRegress",
            predict_params=("roll", "pitch", "general_vfov", "rel_cx", "rel_cy"),
            input_size=32,
        ),
        recover_rpf=True,
        recover_pp=True,
    )
    model = PersNet(cfg)
    mesh = make_mesh(n_data=4, n_model=2)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32),
        "gt_gravity": jnp.asarray(rng.normal(size=(4, 64, 64, 2)), jnp.float32),
        "gt_latitude": jnp.asarray(rng.uniform(-1, 1, size=(4, 64, 64, 1)), jnp.float32),
        "gt_params": jnp.asarray(rng.normal(size=(4, 5)) * 0.3, jnp.float32),
    }
    with mesh:
        state, tx = create_train_state(
            model, jax.random.PRNGKey(0), sample_batchless_shape=(64, 64, 3), mesh=mesh
        )
        step = make_train_step(model, tx, cfg, mesh=mesh)
        losses = []
        for _ in range(3):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # descends on a fixed batch


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_orbax_save_restore_resume(tmp_path):
    """Save mid-training, restore into a fresh process-state, and verify the
    resumed trajectory matches the uninterrupted one exactly."""
    from perspectivefields_tpu.checkpoint import restore_train_state, save_train_state
    from perspectivefields_tpu.train import create_train_state, make_train_step

    cfg = tiny_cfg()
    model = PersNet(cfg)
    rng = np.random.default_rng(1)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32),
        "gt_gravity": jnp.asarray(rng.normal(size=(2, 64, 64, 2)), jnp.float32),
        "gt_latitude": jnp.asarray(rng.uniform(-1, 1, size=(2, 64, 64, 1)), jnp.float32),
    }

    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), sample_batchless_shape=(64, 64, 3)
    )
    step = make_train_step(model, tx, cfg)

    # uninterrupted: 2 steps, checkpoint, 1 more step
    state = step(state, batch)[0]
    state = step(state, batch)[0]
    save_train_state(state, str(tmp_path / "ckpt"))
    state, metrics_a = step(state, batch)
    assert int(state.step) == 3

    # resumed: fresh template, restore, 1 step — identical trajectory
    template, _ = create_train_state(
        model, jax.random.PRNGKey(42), sample_batchless_shape=(64, 64, 3)
    )
    restored = restore_train_state(str(tmp_path / "ckpt"), template)
    assert int(restored.step) == 2
    resumed, metrics_b = step(restored, batch)

    np.testing.assert_allclose(
        float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-6
    )
    a_leaves = jax.tree.leaves(state.params)
    b_leaves = jax.tree.leaves(resumed.params)
    for a, b in zip(a_leaves, b_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_step_dirs_keep_and_fallback(tmp_path):
    """Step-numbered checkpoints: retention of the last `keep`, and restore
    falling back past a corrupted newest save to the previous good one."""
    import os
    import shutil

    from perspectivefields_tpu.checkpoint import restore_train_state, save_train_state
    from perspectivefields_tpu.train import create_train_state, make_train_step

    cfg = tiny_cfg()
    model = PersNet(cfg)
    rng = np.random.default_rng(3)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32),
        "gt_gravity": jnp.asarray(rng.normal(size=(2, 64, 64, 2)), jnp.float32),
        "gt_latitude": jnp.asarray(rng.uniform(-1, 1, size=(2, 64, 64, 1)), jnp.float32),
    }
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), sample_batchless_shape=(64, 64, 3)
    )
    step = make_train_step(model, tx, cfg)
    ck = tmp_path / "ckpt"
    for _ in range(3):
        state = step(state, batch)[0]
        save_train_state(state, str(ck), keep=2)
    dirs = sorted(d for d in os.listdir(ck) if d.startswith("step_"))
    assert dirs == ["step_00000002", "step_00000003"]  # keep=2 pruned step 1

    # corrupt the newest: restore must fall back to step 2 with a warning
    newest = ck / "step_00000003"
    for item in list(newest.iterdir()):
        if item.is_dir():
            shutil.rmtree(item)
        else:
            item.unlink()
    (newest / "garbage").write_text("x")
    template, _ = create_train_state(
        model, jax.random.PRNGKey(1), sample_batchless_shape=(64, 64, 3)
    )
    import warnings as _w

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        restored = restore_train_state(str(ck), template)
    assert int(restored.step) == 2
    assert any("unusable" in str(r.message) for r in rec)
