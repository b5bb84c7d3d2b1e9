"""img_statistics normalization: npz mean/std *images* loaded into the stats
collection at their true shapes (reference lib/policy.py:29-36)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vpt_tpu.config import PolicyConfig
from vpt_tpu.models.policy import ImgPreprocessing

IMG_SHAPE = (16, 16, 3)


@pytest.fixture
def stats_npz(tmp_path):
    rng = np.random.default_rng(0)
    mean = rng.uniform(20, 230, IMG_SHAPE).astype(np.float32)
    std = rng.uniform(5, 80, IMG_SHAPE).astype(np.float32)
    path = str(tmp_path / "img_stats.npz")
    np.savez(path, mean=mean, std=std)
    return path, mean, std


def _tiny_kwargs():
    return dict(
        hidsize=32,
        impala_width=1,
        impala_chans=[2, 4],
        img_shape=list(IMG_SHAPE),
        init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
        impala_kwargs={"post_pool_groups": 1},
        n_recurrence_layers=1,
        timesteps=2,
        attention_heads=2,
        attention_memory_size=4,
        recurrence_type="transformer",
        attention_mask_style="clipped_causal",
        use_pre_lstm_ln=False,
        obs_processing_width=16,
    )


def test_stats_loaded_at_image_shape(stats_npz):
    path, mean, std = stats_npz
    mod = ImgPreprocessing(img_statistics=path)
    img = jnp.zeros((1, 1) + IMG_SHAPE, jnp.uint8)
    variables = mod.init(jax.random.PRNGKey(0), img)
    assert variables["stats"]["img_mean"].shape == IMG_SHAPE
    assert variables["stats"]["img_std"].shape == IMG_SHAPE
    np.testing.assert_allclose(np.asarray(variables["stats"]["img_mean"]), mean)
    np.testing.assert_allclose(np.asarray(variables["stats"]["img_std"]), std)


def test_forward_normalizes_by_images(stats_npz):
    path, mean, std = stats_npz
    mod = ImgPreprocessing(img_statistics=path)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (2, 3) + IMG_SHAPE, dtype=np.uint8)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(img))
    out = np.asarray(mod.apply(variables, jnp.asarray(img)))
    want = (img.astype(np.float32) - mean) / std
    np.testing.assert_allclose(out, want, rtol=1e-6, atol=1e-5)


def test_no_stats_means_scale_by_255():
    mod = ImgPreprocessing()
    img = jnp.full((1, 1) + IMG_SHAPE, 51, jnp.uint8)
    variables = mod.init(jax.random.PRNGKey(0), img)
    assert "stats" not in variables
    out = np.asarray(mod.apply(variables, img))
    np.testing.assert_allclose(out, 0.2, rtol=1e-6)


def test_full_policy_with_stats_and_torch_roundtrip(stats_npz):
    """A policy built with img_statistics initializes image-shaped stats
    leaves, and a torch checkpoint carrying img_mean/img_std at those shapes
    merges with no shape-mismatch skips (the round-1 bug: scalar stats vars
    silently dropped the checkpoint images)."""
    from vpt_tpu.actions.mapping import CameraHierarchicalMapping
    from vpt_tpu.checkpoint.torch_import import (
        state_dict_to_variables,
        variables_to_state_dict,
    )
    from vpt_tpu.models.heads import head_specs_from_space
    from vpt_tpu.models.policy import MinecraftAgentPolicy, policy_initial_state
    from vpt_tpu.spaces import DictType

    path, mean, std = stats_npz
    kwargs = _tiny_kwargs()
    kwargs["img_statistics"] = path
    cfg = PolicyConfig.from_kwargs(kwargs)
    mapper = CameraHierarchicalMapping(n_camera_bins=11)
    specs = head_specs_from_space(DictType(**mapper.get_action_space_update()))
    model = MinecraftAgentPolicy(cfg=cfg, head_specs=specs)
    img = jnp.zeros((1, 2) + IMG_SHAPE, jnp.uint8)
    first = jnp.zeros((1, 2), bool)
    state = policy_initial_state(cfg, 1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, first, state)
    stats = variables["stats"]["net"]["img_preprocess"]
    assert stats["img_mean"].shape == IMG_SHAPE

    # round-trip through the torch state_dict layout
    sd = variables_to_state_dict(variables)
    mean_keys = [k for k in sd if k.endswith("img_mean")]
    assert mean_keys, f"img_mean missing from exported state_dict: {sorted(sd)[:8]}"
    # perturb the stats in the "checkpoint" and merge back
    sd[mean_keys[0]] = sd[mean_keys[0]] + 1.0
    merged, report = state_dict_to_variables(sd, variables=variables)
    assert report["shape_mismatch"] == [], report["shape_mismatch"]
    assert report["unexpected"] == [], report["unexpected"]
    got = np.asarray(merged["stats"]["net"]["img_preprocess"]["img_mean"])
    np.testing.assert_allclose(got, mean + 1.0, rtol=1e-6)

    # forward with the merged stats changes the output (stats are live)
    out1, _ = model.apply(variables, img, first, state)
    out2, _ = model.apply(merged, img, first, state)
    assert not np.allclose(np.asarray(out1["vpred"]), np.asarray(out2["vpred"]))
