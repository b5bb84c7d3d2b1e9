"""FULL-PUBLISHED-GEOMETRY parity against the actual reference code.

The tiny-width oracles (test_reference_oracle.py) pin semantics; these pin
them at the shapes the published checkpoints actually ship — the reference's
own fallback kwargs (reference agent.py:16-36: hidsize 2048, 16 heads,
4 blocks, Impala chans 128/256/256, attention_memory_size 256/timesteps 128)
— where width-dependent bugs can hide that tiny shapes never exercise:
head-split order at 16 heads, GroupNorm grouping at 128 channels, b_nd
banding at maxlen=128, muP alpha = 1/128 per head.

All tests are in the ``slow`` tier (full-width torch + JAX forwards on a
1-core CPU host; the policy rollout alone is ~10 GFLOP/frame per framework).
Run with:  pytest -m slow tests/test_full_geometry_parity.py

Published parameter counts (README.md:39-79 model cards / VPT paper):
1x ≈ 71M, 2x ≈ 248M, 3x ≈ 0.5B — asserted exactly against the torch
reference and within 1% of the published sizes.
"""

import os
import sys

import numpy as np
import pytest

from test_reference_oracle import _install_reference, _torch_sd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # bench.py

pytestmark = pytest.mark.slow

# observed max-abs deltas at full width (recorded 2026-08-18, f32 highest
# precision, CPU): logits ~2e-4..1e-3 — width grows the accumulation error
# vs the 2e-4 tiny-shape tolerance, so the bound here is 2e-3 against a
# logit scale of O(10)
TOL_FULL = 2e-3


def _full_kwargs(width: int) -> dict:
    """The reference's own fallback kwargs scaled to a width multiple
    (agent.py:16-36 is the 2x point: hidsize 2048, impala_width 8)."""
    import agent as ref_agent

    return dict(ref_agent.POLICY_KWARGS, hidsize=1024 * width, impala_width=4 * width)


def _our_policy(kwargs, temperature=2.0):
    from vpt_tpu.actions.mapping import CameraHierarchicalMapping
    from vpt_tpu.config import PolicyConfig
    from vpt_tpu.models.heads import head_specs_from_space
    from vpt_tpu.models.policy import MinecraftAgentPolicy
    from vpt_tpu.spaces import DictType

    cfg = PolicyConfig.from_kwargs(kwargs)
    mapper = CameraHierarchicalMapping(n_camera_bins=11)
    specs = head_specs_from_space(DictType(**mapper.get_action_space_update()))
    return MinecraftAgentPolicy(cfg=cfg, head_specs=specs, temperature=temperature), cfg, specs


@pytest.mark.parametrize("width,published_m", [(1, 71), (2, 248), (3, 497)])
def test_param_counts_match_reference_and_published(width, published_m):
    """Our parameter tree at width w has EXACTLY the reference model's leaf
    count (torch .parameters(), which includes the EWMA stats params the
    checkpoints carry) and lands on the published model size."""
    _install_reference()
    import jax
    import jax.numpy as jnp

    import vpt_tpu.spaces as spaces
    from lib.action_mapping import CameraHierarchicalMapping as RefMapping
    from lib.policy import MinecraftAgentPolicy as RefPolicy

    from vpt_tpu.models.policy import policy_initial_state

    kwargs = _full_kwargs(width)
    model, cfg, _ = _our_policy(kwargs)
    img = jnp.zeros((1, 1, 128, 128, 3), jnp.uint8)
    first = jnp.zeros((1, 1), bool)
    state = policy_initial_state(cfg, 1)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), img, first, state)
    ours = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))

    ref_mapper = RefMapping(n_camera_bins=11)
    ref = RefPolicy(
        action_space=spaces.DictType(**ref_mapper.get_action_space_update()),
        policy_kwargs=kwargs,
        pi_head_kwargs={"temperature": 2.0},
    )
    theirs = sum(p.numel() for p in ref.parameters())
    assert ours == theirs, (width, ours, theirs)
    # published sizes: 71M / 248M / 0.5B (README model cards).  The exact
    # counts land at 71.33M / 248.50M / 531.52M; "0.5B" is the paper's
    # rounding of the 3x point, so the 3x bound is looser.
    rel = abs(ours - published_m * 1e6) / (published_m * 1e6)
    assert rel < (0.08 if width == 3 else 0.01), (width, ours)


def test_idm_4x_bench_arch_param_count():
    """Pin the benchmark IDM architecture's size: IDM_4X_KWARGS must land on
    the paper's 0.5B IDM (the published 4x_idm.model ships its own kwargs —
    unavailable offline — so the bench uses the documented 4x scaling; this
    asserts the scaled geometry is at least the right SIZE of model, so the
    2000+ fps labeling headline benchmarks a 0.5B-class network)."""
    import jax
    import jax.numpy as jnp

    from bench import IDM_4X_KWARGS
    from vpt_tpu.actions.mapping import IDMActionMapping
    from vpt_tpu.config import PolicyConfig
    from vpt_tpu.models.heads import head_specs_from_space
    from vpt_tpu.models.policy import InverseActionPolicy, policy_initial_state
    from vpt_tpu.spaces import DictType

    cfg = PolicyConfig.from_kwargs(IDM_4X_KWARGS)
    space = DictType(**IDMActionMapping(n_camera_bins=11).get_action_space_update())
    model = InverseActionPolicy(cfg=cfg, head_specs=head_specs_from_space(space),
                                temperature=1.0)
    img = jnp.zeros((1, 128, 128, 128, 3), jnp.uint8)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), img,
                            jnp.zeros((1, 128), bool), policy_initial_state(cfg, 1))
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
    # 4x of the 1x policy's 71M ≈ width² scaling on the dense trunk → ~0.5B;
    # the exact representative config lands at ~0.95-1.1x of 0.5e9
    assert 0.45e9 < n < 0.60e9, f"IDM_4X_KWARGS is a {n/1e9:.3f}B model, not ~0.5B"


@pytest.mark.parametrize("width", [2, 3])
def test_full_geometry_policy_stepped_rollout_parity(width):
    """Fallback kwargs VERBATIM at the published checkpoint geometries — 2x
    (the fallback default) and 3x (the BASELINE headline target width):
    multi-chunk stepped rollout with episode resets through the maxlen=128
    KV cache — logits, raw/denormalized values within TOL_FULL, and
    deterministic (argmax) action decode identical frame by frame."""
    _install_reference()
    import jax
    import jax.numpy as jnp
    import torch as th

    import vpt_tpu.spaces as spaces
    from lib.action_mapping import CameraHierarchicalMapping as RefMapping
    from lib.policy import MinecraftAgentPolicy as RefPolicy

    from vpt_tpu.models.policy import policy_initial_state

    kwargs = _full_kwargs(width)
    assert kwargs["hidsize"] == 1024 * width and kwargs["attention_heads"] == 16
    assert kwargs["attention_memory_size"] == 256 and kwargs["timesteps"] == 128

    model, cfg, specs = _our_policy(kwargs)
    B, T, CHUNKS = 1, 2, 3
    img0 = jnp.zeros((B, T, 128, 128, 3), jnp.uint8)
    first0 = jnp.zeros((B, T), bool)
    state0 = policy_initial_state(cfg, B)
    # eager init (jitting the 248M/531M-param init at full width costs more
    # in compile than the forward saves)
    variables = model.init(jax.random.PRNGKey(0), img0, first0, state0)

    ref_mapper = RefMapping(n_camera_bins=11)
    ref = RefPolicy(
        action_space=spaces.DictType(**ref_mapper.get_action_space_update()),
        policy_kwargs=kwargs,
        pi_head_kwargs={"temperature": 2.0},
    ).float().eval()
    ref.load_state_dict(_torch_sd(variables), strict=True)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (CHUNKS, B, T, 128, 128, 3), dtype=np.uint8)
    firsts = np.zeros((CHUNKS, B, T), bool)
    firsts[0, :, 0] = True
    firsts[2, 0, 0] = True  # mid-stream episode reset through the full cache

    step = jax.jit(model.apply)
    state = policy_initial_state(cfg, B)
    ref_state = ref.initial_state(B)
    max_delta = {"buttons": 0.0, "camera": 0.0, "vpred": 0.0}
    with th.no_grad():
        for c in range(CHUNKS):
            out, state = step(variables, jnp.asarray(imgs[c]), jnp.asarray(firsts[c]), state)
            (ref_pd, ref_vraw, _), ref_state = ref(
                {"img": th.from_numpy(imgs[c])}, th.from_numpy(firsts[c]), ref_state
            )
            for k in ("buttons", "camera"):
                ours = np.asarray(out["pi_logits"][k], np.float64)
                theirs = ref_pd[k].numpy().astype(np.float64).reshape(ours.shape)
                d = float(np.abs(ours - theirs).max())
                max_delta[k] = max(max_delta[k], d)
                assert d <= TOL_FULL, (c, k, d)
                # deterministic action decode must agree exactly
                assert np.array_equal(ours.argmax(-1), theirs.argmax(-1)), (c, k)
            ours_v = np.asarray(out["vpred"], np.float64)
            theirs_v = ref.value_head.denormalize(ref_vraw).numpy().astype(np.float64)
            d = float(np.abs(ours_v - theirs_v.reshape(ours_v.shape)).max())
            max_delta["vpred"] = max(max_delta["vpred"], d)
            assert d <= TOL_FULL, (c, d)
    print(f"full-geometry {width}x policy max-abs deltas over {CHUNKS * T} frames: {max_delta}")


def test_full_geometry_idm_window_parity():
    """Representative 4x IDM width (hidsize 4096, 32 heads, Impala width 16,
    conv3d 128-channel front — bench.py's IDM_4X_KWARGS scaling) over a
    bidirectional window.  The window length is shortened to 16 (the
    time axis is length-generic and pinned at tiny width); every
    WIDTH-dependent structure runs at full scale."""
    _install_reference()
    import jax
    import jax.numpy as jnp
    import torch as th

    from lib.policy import InverseActionPolicy as RefIDM

    from vpt_tpu.actions.mapping import IDMActionMapping
    from vpt_tpu.config import PolicyConfig
    from vpt_tpu.models.heads import head_specs_from_space
    from vpt_tpu.models.policy import InverseActionPolicy, policy_initial_state
    from vpt_tpu.spaces import DictType

    from bench import IDM_4X_KWARGS

    idm_kwargs = dict(IDM_4X_KWARGS, timesteps=16, attention_memory_size=32)
    cfg = PolicyConfig.from_kwargs(idm_kwargs)
    mapper = IDMActionMapping(n_camera_bins=11)
    space = DictType(**mapper.get_action_space_update())
    specs = head_specs_from_space(space)
    model = InverseActionPolicy(cfg=cfg, head_specs=specs, temperature=1.0)

    B, T = 1, 16
    img0 = jnp.zeros((B, T, 128, 128, 3), jnp.uint8)
    first0 = jnp.zeros((B, T), bool)
    state0 = policy_initial_state(cfg, B)
    variables = model.init(jax.random.PRNGKey(1), img0, first0, state0)

    ref = RefIDM(
        action_space=space,
        pi_head_kwargs={"temperature": 1.0},
        idm_net_kwargs=idm_kwargs,
    ).float().eval()
    ref.load_state_dict(_torch_sd(variables), strict=True)

    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (B, T, 128, 128, 3), dtype=np.uint8)
    firsts = np.zeros((B, T), bool)
    firsts[:, 0] = True

    out, _ = jax.jit(model.apply)(variables, jnp.asarray(imgs), jnp.asarray(firsts), state0)
    with th.no_grad():
        (ref_pd, _, _), _ = ref(
            {"img": th.from_numpy(imgs)}, th.from_numpy(firsts), ref.initial_state(B)
        )
    max_delta = {}
    for k in ("buttons", "camera"):
        ours = np.asarray(out["pi_logits"][k], np.float64)
        theirs = ref_pd[k].numpy().astype(np.float64).reshape(ours.shape)
        max_delta[k] = float(np.abs(ours - theirs).max())
        assert max_delta[k] <= TOL_FULL, (k, max_delta[k])
        assert np.array_equal(ours.argmax(-1), theirs.argmax(-1)), k
    print(f"full-geometry 4x IDM max-abs logit deltas over {T} frames: {max_delta}")
