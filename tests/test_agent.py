"""Agent wrapper tests with tiny model kwargs (fast on CPU)."""

import numpy as np
import pytest

from vpt_tpu.agent import IDMAgent, MineRLAgent
from vpt_tpu.agent.agent import TARGET_ACTION_NAMES, validate_env

TINY_KWARGS = dict(
    hidsize=64,
    impala_width=1,
    impala_chans=[4, 8],
    img_shape=[64, 64, 3],
    init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
    impala_kwargs={"post_pool_groups": 1},
    n_recurrence_layers=2,
    timesteps=4,
    attention_heads=4,
    attention_memory_size=8,
    recurrence_type="transformer",
    attention_mask_style="clipped_causal",
    use_pre_lstm_ln=False,
    obs_processing_width=32,
)
PI_KWARGS = {"temperature": 2.0}


def _obs(h=360, w=640, seed=0):
    rng = np.random.default_rng(seed)
    return {"pov": rng.integers(0, 255, (h, w, 3), dtype=np.uint8)}


@pytest.fixture(scope="module")
def agent():
    return MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs=PI_KWARGS)


def test_get_action_shape_and_names(agent):
    action = agent.get_action(_obs())
    assert set(action.keys()) - {"camera"} <= TARGET_ACTION_NAMES
    assert action["camera"].shape == (2,)
    for k, v in action.items():
        if k != "camera":
            assert v in (0, 1)
    # camera decodes to degrees within the quantizer range
    assert np.all(np.abs(action["camera"]) <= 10.0)


def test_hidden_state_advances(agent):
    agent.reset()
    s0 = np.asarray(agent.hidden_state[0]["k"]).copy()
    agent.get_action(_obs(seed=1))
    s1 = np.asarray(agent.hidden_state[0]["k"])
    assert not np.array_equal(s0, s1)
    agent.reset()
    np.testing.assert_array_equal(np.asarray(agent.hidden_state[0]["k"]), s0)


def test_deterministic_mode_is_repeatable(agent):
    agent.reset()
    a1 = agent.get_action(_obs(seed=2), stochastic=False)
    agent.reset()
    a2 = agent.get_action(_obs(seed=2), stochastic=False)
    for k in a1:
        np.testing.assert_array_equal(a1[k], a2[k])


def test_env_action_round_trip(agent):
    env_action = {
        "attack": np.array([1]),
        "forward": np.array([1]),
        "camera": np.array([[3.0, -2.0]]),
    }
    enc = agent._env_action_to_agent(env_action)
    assert enc["buttons"].shape == (1, 1)
    dec = agent._agent_action_to_env({k: v for k, v in enc.items()})
    assert dec["attack"][0] == 1 and dec["forward"][0] == 1
    # mu-law quantization: decoded camera is the bin center nearest the input
    assert abs(dec["camera"][0][0] - 3.0) < 1.5


def test_null_action_detection(agent):
    from vpt_tpu.actions import NOOP_ACTION

    null = dict(NOOP_ACTION)
    assert agent._env_action_to_agent(null, check_if_null=True) is None
    moved = dict(NOOP_ACTION)
    moved["camera"] = np.array([5.0, 0.0])
    assert agent._env_action_to_agent(moved, check_if_null=True) is not None


def test_batched_rollout_streams():
    agent = MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs=PI_KWARGS, batch_size=3)
    obs = [_obs(seed=i) for i in range(3)]
    actions = agent.get_action(obs, first=np.array([True, True, True]))
    assert isinstance(actions, list) and len(actions) == 3
    assert actions[0]["camera"].shape == (2,)
    # stream states are independent: resetting stream 1 only
    actions2 = agent.get_action(obs, first=np.array([False, True, False]))
    assert len(actions2) == 3


def test_resize_on_device_mode():
    agent = MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs=PI_KWARGS,
                        batch_size=2, resize_on_device=True)
    obs = [_obs(seed=i) for i in range(2)]
    actions = agent.get_action(obs, stochastic=False)
    assert len(actions) == 2 and actions[0]["camera"].shape == (2,)
    # host-resize agent on the same weights agrees on the deterministic action
    # for a clearly non-tied input (both resizers are ≤1 LSB apart)
    host = MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs=PI_KWARGS, batch_size=2)
    host._ensure_variables()
    agent._ensure_variables()
    host.variables = agent.variables
    a2 = host.get_action(obs, stochastic=False)
    same = sum(int(np.array_equal(actions[i]["camera"], a2[i]["camera"])) for i in range(2))
    assert same >= 1  # allow one near-tie flip


def test_params_dtype_bf16_serving(tmp_path):
    from vpt_tpu.checkpoint import save_weights
    import jax
    import jax.numpy as jnp

    base = MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs=PI_KWARGS)
    base._ensure_variables()
    path = str(tmp_path / "w.weights")
    save_weights(path, base.variables)
    agent = MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs=PI_KWARGS,
                        compute_dtype="bfloat16", params_dtype="bfloat16")
    agent.load_weights(path)
    kernels = [x for x in jax.tree.leaves(agent.variables["params"]) if x.ndim >= 2]
    assert all(k.dtype == jnp.bfloat16 for k in kernels)
    action = agent.get_action(_obs(seed=9), stochastic=False)
    assert np.isfinite(action["camera"]).all()


def test_weights_round_trip_through_agent(agent, tmp_path):
    from vpt_tpu.checkpoint import save_weights

    agent._ensure_variables()
    path = str(tmp_path / "agent.weights")
    save_weights(path, agent.variables)
    fresh = MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs=PI_KWARGS)
    fresh.load_weights(path)
    fresh2 = MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs=PI_KWARGS)
    fresh2.load_weights(path)
    o = _obs(seed=3)
    a1 = fresh.get_action(o, stochastic=False)
    a2 = fresh2.get_action(o, stochastic=False)
    for k in a1:
        np.testing.assert_array_equal(a1[k], a2[k])


def test_validate_env_accepts_matching_names():
    class FakeSpace:
        spaces = {k: None for k in TARGET_ACTION_NAMES}

    class FakeEnv:
        action_space = FakeSpace()

    validate_env(FakeEnv())


def test_validate_env_rejects_wrong_names():
    class FakeSpace:
        spaces = {"attack": None}

    class FakeEnv:
        action_space = FakeSpace()

    with pytest.raises(ValueError):
        validate_env(FakeEnv())


IDM_TINY_KWARGS = dict(
    hidsize=64,
    impala_width=1,
    impala_chans=[4, 8],
    img_shape=[64, 64, 3],
    init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
    impala_kwargs={"post_pool_groups": 1},
    n_recurrence_layers=2,
    timesteps=4,
    attention_heads=4,
    attention_memory_size=8,
    recurrence_type="transformer",
    attention_mask_style="none",
    conv3d_params={"inchan": 3, "outchan": 8, "kernel_size": [5, 1, 1], "padding": [2, 0, 0]},
    use_pre_lstm_ln=False,
    obs_processing_width=32,
)


def test_idm_predict_actions():
    agent = IDMAgent(idm_net_kwargs=IDM_TINY_KWARGS, pi_head_kwargs={"temperature": 1.0})
    frames = np.random.default_rng(0).integers(0, 255, (4, 360, 640, 3), dtype=np.uint8)
    actions = agent.predict_actions(frames)
    assert actions["camera"].shape == (1, 4, 2)
    assert actions["attack"].shape == (1, 4)
    assert set(np.unique(actions["attack"])) <= {0, 1}
    # deterministic: same frames → same labels
    agent.reset()
    actions2 = agent.predict_actions(frames)
    np.testing.assert_array_equal(actions["camera"], actions2["camera"])


def test_mesh_sharded_serving_matches_single_device(tmp_path):
    """dp-sharded serving (params replicated, stream axis + KV caches sharded
    over an 8-device mesh) produces the same actions as single-device serving
    from the same weights — the multi-chip batched-rollout runtime contract
    (SURVEY §2).  Deterministic decode isolates the comparison from sampling."""
    import jax

    from vpt_tpu.checkpoint import save_weights
    from vpt_tpu.parallel.mesh import make_mesh

    B = 8
    base = MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs=PI_KWARGS,
                       batch_size=B, seed=0)
    base._ensure_variables()
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, jax.tree.map(np.asarray, base.variables))

    mesh = make_mesh(n_dp=8)
    sharded = MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs=PI_KWARGS,
                          batch_size=B, seed=0, mesh=mesh)
    sharded.load_weights(wpath)
    base.load_weights(wpath)

    # the KV cache must actually live sharded on the mesh
    leaf = jax.tree.leaves(sharded.hidden_state)[-1]
    spec_axes = [
        a for el in tuple(getattr(leaf.sharding, "spec", ()))
        for a in (el if isinstance(el, (tuple, list)) else (el,))
    ]
    assert "dp" in spec_axes, leaf.sharding

    obs = [_obs(seed=100 + i) for i in range(B)]
    for step in range(3):
        first = np.zeros(B, bool)
        if step == 1:
            first[::2] = True  # mid-run resets must agree too
        a1 = base.get_action(obs, first=first, stochastic=False)
        a2 = sharded.get_action(obs, first=first, stochastic=False)
        for i in range(B):
            for k in a1[i]:
                np.testing.assert_array_equal(
                    np.asarray(a1[i][k]), np.asarray(a2[i][k]), err_msg=(step, i, k)
                )
        obs = [_obs(seed=200 + 17 * step + i) for i in range(B)]


def test_mesh_sharded_int8_serving_matches_single_device(tmp_path):
    """The int8 fast path composes with multi-chip serving: quantization is
    deterministic, so dp-sharded int8 serving must equal single-device int8
    serving action-for-action."""
    import jax

    from vpt_tpu.checkpoint import save_weights
    from vpt_tpu.parallel.mesh import make_mesh

    B = 8
    base = MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs=PI_KWARGS,
                       batch_size=B, seed=0, quantize_dense=True)
    base._ensure_variables(quantize=False)
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, jax.tree.map(np.asarray, base.variables))
    base.load_weights(wpath)

    sharded = MineRLAgent(policy_kwargs=TINY_KWARGS, pi_head_kwargs=PI_KWARGS,
                          batch_size=B, seed=0, quantize_dense=True,
                          mesh=make_mesh(n_dp=8))
    sharded.load_weights(wpath)

    obs = [_obs(seed=300 + i) for i in range(B)]
    for step in range(2):
        a1 = base.get_action(obs, stochastic=False)
        a2 = sharded.get_action(obs, stochastic=False)
        for i in range(B):
            for k in a1[i]:
                np.testing.assert_array_equal(
                    np.asarray(a1[i][k]), np.asarray(a2[i][k]), err_msg=(step, i, k)
                )
        obs = [_obs(seed=400 + 7 * step + i) for i in range(B)]
