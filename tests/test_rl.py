"""PPO RL fine-tuning tests (training/rl.py): GAE oracle, rollout collection,
learning on a synthetic reward, and the KL anchor to the frozen foundation
policy.  Runs on the virtual CPU mesh (single-device unless noted)."""

import jax
import numpy as np
import pytest

from vpt_tpu.parallel.mesh import make_mesh
from vpt_tpu.training.rl import PPOHyperparams, PPOTrainer, compute_gae

TINY_KWARGS = dict(
    hidsize=64,
    impala_width=1,
    impala_chans=[4, 8],
    img_shape=[32, 32, 3],
    init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
    impala_kwargs={"post_pool_groups": 1},
    n_recurrence_layers=2,
    timesteps=16,
    attention_heads=4,
    attention_memory_size=32,
    recurrence_type="transformer",
    attention_mask_style="clipped_causal",
    use_pre_lstm_ln=False,
    obs_processing_width=32,
)


# ---------------------------------------------------------------------- GAE


def _gae_loop_oracle(rewards, values, firsts, last_value, last_first, gamma, lam):
    """Straightforward per-episode loop implementation of GAE."""
    b, t_len = rewards.shape
    adv = np.zeros((b, t_len), np.float64)
    for i in range(b):
        next_adv = 0.0
        for t in reversed(range(t_len)):
            if t == t_len - 1:
                nonterm = 0.0 if last_first[i] else 1.0
                next_v = last_value[i]
            else:
                nonterm = 0.0 if firsts[i, t + 1] else 1.0
                next_v = values[i, t + 1]
            delta = rewards[i, t] + gamma * next_v * nonterm - values[i, t]
            next_adv = delta + gamma * lam * nonterm * next_adv
            adv[i, t] = next_adv
    return adv, adv + values


def test_gae_matches_loop_oracle():
    rng = np.random.default_rng(0)
    b, t_len = 3, 17
    rewards = rng.normal(size=(b, t_len)).astype(np.float32)
    values = rng.normal(size=(b, t_len)).astype(np.float32)
    firsts = rng.random((b, t_len)) < 0.2
    firsts[:, 0] = True
    last_value = rng.normal(size=b).astype(np.float32)
    last_first = np.array([True, False, False])
    gamma, lam = 0.99, 0.95

    adv, ret = compute_gae(rewards, values, firsts, last_value, last_first, gamma, lam)
    adv_o, ret_o = _gae_loop_oracle(rewards, values, firsts, last_value, last_first, gamma, lam)
    np.testing.assert_allclose(np.asarray(adv), adv_o, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), ret_o, rtol=1e-5, atol=1e-5)


def test_gae_zero_when_values_consistent():
    # if V is exact for a constant-reward infinite stream, advantages vanish
    gamma, lam = 0.9, 0.8
    t_len = 8
    v = 1.0 / (1.0 - gamma)  # value of +1 forever
    rewards = np.ones((1, t_len), np.float32)
    values = np.full((1, t_len), v, np.float32)
    firsts = np.zeros((1, t_len), bool)
    adv, _ = compute_gae(rewards, values, np.asarray(firsts),
                         np.full(1, v, np.float32), np.zeros(1, bool), gamma, lam)
    np.testing.assert_allclose(np.asarray(adv), 0.0, atol=1e-5)


# ----------------------------------------------------------------- trainer


def _make_trainer(b=4, rollout_len=8, n_minibatches=2, **hp_kw):
    hp = PPOHyperparams(rollout_len=rollout_len, n_minibatches=n_minibatches,
                        n_epochs=2, **hp_kw)
    mesh = make_mesh(n_dp=1, devices=jax.devices()[:1])
    trainer = PPOTrainer(TINY_KWARGS, {"temperature": 2.0}, hp=hp, mesh=mesh, seed=0)
    trainer.init()
    return trainer


def _envs(n, done_prob=0.0):
    from vpt_tpu.agent.rollout import MockMinecraftEnv

    return [MockMinecraftEnv(seed=i, done_prob=done_prob) for i in range(n)]


def test_collect_shapes_and_resets():
    trainer = _make_trainer(b=2, rollout_len=6)
    envs = _envs(2, done_prob=0.35)
    traj, obs, firsts = trainer.collect(envs, reward_fn=lambda a, o, r, d: 1.0)
    assert traj["frames"].shape == (2, 6, 32, 32, 3)
    for key in ("buttons", "camera", "logp_old", "values", "rewards", "firsts"):
        assert traj[key].shape == (2, 6), key
    assert traj["last_value"].shape == (2,)
    assert np.all(traj["rewards"] == 1.0)
    assert np.all(traj["firsts"][:, 0])  # fresh envs start an episode
    assert np.isfinite(traj["logp_old"]).all() and np.isfinite(traj["values"]).all()
    # done_prob=0.35 over 2x6 steps: some reset must have occurred
    assert traj["firsts"][:, 1:].any() or np.asarray(firsts).any()
    # threading obs/firsts continues the stream without reinitialization
    traj2, _, _ = trainer.collect(envs, obs, firsts)
    assert not traj2["firsts"][:, 0].all() or np.asarray(firsts).all()


def test_update_metrics_and_finiteness():
    trainer = _make_trainer(b=4, rollout_len=8)
    envs = _envs(4)
    rng = np.random.default_rng(1)
    traj, _, _ = trainer.collect(
        envs, reward_fn=lambda a, o, r, d: float(rng.normal())
    )
    metrics = trainer.update(traj)
    for key in ("loss", "pg_loss", "v_loss", "entropy", "anchor_kl",
                "approx_kl", "clip_frac", "grad_norm"):
        assert np.isfinite(metrics[key]), (key, metrics)
    assert 0.0 <= metrics["clip_frac"] <= 1.0
    assert metrics["anchor_kl"] >= -1e-6
    assert metrics["kl_coef"] < trainer.hp.kl_coef  # decayed once
    # EWMA return stats folded: debiasing term moved off zero
    stats = jax.tree.map(np.asarray, trainer.variables["stats"])["value_head"]
    assert stats["debiasing_term"] > 0.0


def _attack_prob(trainer, frames):
    """Mean probability that the sampled joint button combo presses attack."""
    import jax.numpy as jnp

    from vpt_tpu.models.policy import policy_initial_state

    state = policy_initial_state(trainer.cfg, frames.shape[0])
    out, _ = jax.jit(trainer.policy.apply)(
        trainer.variables, jnp.asarray(frames),
        jnp.ones(frames.shape[:2], bool), state,
    )
    probs = np.exp(np.asarray(out["pi_logits"]["buttons"], np.float64))
    mapper = trainer.action_mapper
    n = probs.shape[-1]
    factored = mapper.to_factored(
        {"buttons": np.arange(n)[:, None], "camera": np.full((n, 1), 60)}
    )
    from vpt_tpu.actions.buttons import Buttons

    attack = factored["buttons"][:, Buttons.ALL.index("attack")].astype(bool)
    return float(probs[..., attack].sum(-1).mean())


def test_ppo_learns_synthetic_reward():
    """Reward +1 whenever the decoded env action presses 'attack': the policy
    must shift probability mass toward attack combos.  γ=0 makes it a bandit
    so the advantage signal is exactly the per-action reward (the general
    GAE path is covered by the loop-oracle tests above)."""
    hp = PPOHyperparams(rollout_len=16, n_minibatches=1, n_epochs=3,
                        learning_rate=6e-3, kl_coef=0.0, gamma=0.0, lam=0.0)
    mesh = make_mesh(n_dp=1, devices=jax.devices()[:1])
    trainer = PPOTrainer(TINY_KWARGS, {"temperature": 2.0}, hp=hp, mesh=mesh, seed=0)
    trainer.init()
    envs = _envs(4)
    rng = np.random.default_rng(0)
    probe = rng.integers(0, 255, (2, 4, 32, 32, 3), dtype=np.uint8)
    p_before = _attack_prob(trainer, probe)

    def reward(env_action, obs, r, done):
        return float(env_action["attack"])

    obs = firsts = None
    for _ in range(10):
        traj, obs, firsts = trainer.collect(envs, obs, firsts, reward_fn=reward)
        trainer.update(traj)
    p_after = _attack_prob(trainer, probe)
    # a no-signal run moves p by ~1e-3; demand an order of magnitude more
    assert p_after > p_before + 0.02, (p_before, p_after)


def test_chunked_anchor_forward_matches_one_shot():
    """The stream-axis-chunked anchor forward (anchor_fwd_max_frames) is
    numerically identical to the one-shot (B, T) pass — streams are
    independent given their initial state, so chunking only bounds the
    compiled program's size."""
    trainer = _make_trainer(b=4, rollout_len=8)
    envs = _envs(4, done_prob=0.2)
    traj, _, _ = trainer.collect(envs)
    frames = jax.numpy.asarray(traj["frames"])
    firsts = jax.numpy.asarray(traj["firsts"])
    state = traj["initial_state"]

    trainer.hp.anchor_fwd_max_frames = 0          # force one-shot
    one_shot = trainer._anchor_logits(frames, firsts, state)
    trainer.hp.anchor_fwd_max_frames = 8          # 1 stream x 8 steps per chunk
    chunked = trainer._anchor_logits(frames, firsts, state)

    for key in one_shot:
        # identical math; tolerance only for batch-size-dependent fusion
        np.testing.assert_allclose(np.asarray(one_shot[key]),
                                   np.asarray(chunked[key]),
                                   rtol=1e-6, atol=1e-6, err_msg=key)


def test_kl_anchor_restrains_drift():
    """With a large KL coefficient the policy stays glued to the anchor even
    under the same reward pressure that moves the unanchored policy."""
    def run(kl_coef):
        trainer = _make_trainer(b=4, rollout_len=8, n_minibatches=1,
                                learning_rate=3e-4, kl_coef=kl_coef, kl_decay=1.0)
        envs = _envs(4)
        obs = firsts = None
        last = {}
        for _ in range(3):
            traj, obs, firsts = trainer.collect(
                envs, obs, firsts,
                reward_fn=lambda a, o, r, d: float(a["attack"]),
            )
            last = trainer.update(traj)
        return last["anchor_kl"]

    drift_free = run(kl_coef=0.0)
    drift_anchored = run(kl_coef=50.0)
    assert drift_anchored < drift_free, (drift_anchored, drift_free)


def test_ppo_dp_mesh_smoke():
    """One collect+update cycle with streams sharded over all 8 devices."""
    assert len(jax.devices()) == 8
    hp = PPOHyperparams(rollout_len=4, n_minibatches=1, n_epochs=1)
    trainer = PPOTrainer(TINY_KWARGS, {"temperature": 2.0}, hp=hp,
                         mesh=make_mesh(n_dp=8), seed=0)
    trainer.init()
    envs = _envs(8)
    traj, _, _ = trainer.collect(envs, reward_fn=lambda a, o, r, d: 1.0)
    metrics = trainer.update(traj)
    assert np.isfinite(metrics["loss"])


def test_ppo_fsdp_update_matches_single_device():
    """The PPO update on a (dp=2, fsdp=4) mesh must equal the single-device
    update — with params, Adam moments, and the frozen anchor all actually
    sharded over fsdp."""
    hp_kw = dict(rollout_len=4, n_minibatches=1, n_epochs=1)

    def make(mesh):
        hp = PPOHyperparams(**hp_kw)
        t = PPOTrainer(TINY_KWARGS, {"temperature": 2.0}, hp=hp, mesh=mesh, seed=0)
        t.init()
        return t

    # one shared trajectory, collected once on the single-device trainer
    t1 = make(make_mesh(n_dp=1, devices=jax.devices()[:1]))
    traj, _, _ = t1.collect(_envs(8), reward_fn=lambda a, o, r, d: 1.0)
    traj = jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, traj)

    tf = make(make_mesh(n_dp=2, n_fsdp=4))
    hk = tf.variables["params"]["pi_head"]["buttons"]["linear_layer"]["kernel"]
    assert "fsdp" in tuple(hk.sharding.spec)
    ak = tf.anchor_params["pi_head"]["buttons"]["linear_layer"]["kernel"]
    assert "fsdp" in tuple(ak.sharding.spec)

    m1 = t1.update(dict(traj))
    mf = tf.update(dict(traj))
    np.testing.assert_allclose(mf["loss"], m1["loss"], rtol=1e-4)
    for a, b in zip(jax.tree.leaves(tf.variables["params"]),
                    jax.tree.leaves(t1.variables["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6)
    # moments stayed sharded through the donated step
    hk2 = tf.variables["params"]["pi_head"]["buttons"]["linear_layer"]["kernel"]
    assert "fsdp" in tuple(hk2.sharding.spec)


def test_ppo_checkpoint_resume(tmp_path):
    """save_checkpoint → fresh trainer → resume restores policy, anchor,
    optimizer moments, rng, and the KL anneal state exactly."""
    trainer = _make_trainer(b=2, rollout_len=4, n_minibatches=1, kl_decay=0.5)
    envs = _envs(2)
    obs = firsts = None
    for _ in range(2):
        traj, obs, firsts = trainer.collect(envs, obs, firsts,
                                            reward_fn=lambda a, o, r, d: 1.0)
        trainer.update(traj)
    trainer.save_checkpoint(str(tmp_path))

    fresh = _make_trainer(b=2, rollout_len=4, n_minibatches=1, kl_decay=0.5)
    assert fresh.resume(str(tmp_path))
    assert fresh.update_count == 2
    assert fresh.kl_coef == pytest.approx(trainer.kl_coef)
    np.testing.assert_array_equal(np.asarray(fresh._rng), np.asarray(trainer._rng))
    for a, b in zip(jax.tree_util.tree_leaves(fresh.variables),
                    jax.tree_util.tree_leaves(trainer.variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(fresh.anchor_params),
                    jax.tree_util.tree_leaves(trainer.anchor_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(fresh.opt_state),
                    jax.tree_util.tree_leaves(trainer.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the resumed trainer continues training (train() loop honors the count)
    report = fresh.train(_envs(2), 3, reward_fn=lambda a, o, r, d: 1.0)
    assert fresh.update_count == 3
    assert np.isfinite(report["loss"])


def test_ppg_aux_phase_schedule():
    """With aux_phase_every=2 the phase fires on the 2nd update, reports aux
    metrics, and consumes the rollout buffer."""
    trainer = _make_trainer(b=2, rollout_len=4, n_minibatches=1,
                            aux_phase_every=2, aux_epochs=2)
    envs = _envs(2)
    obs = firsts = None
    traj, obs, firsts = trainer.collect(envs, reward_fn=lambda a, o, r, d: 1.0)
    m1 = trainer.update(traj)
    assert "aux_v_loss" not in m1 and len(trainer._aux_buffer) == 1
    traj, obs, firsts = trainer.collect(envs, obs, firsts,
                                        reward_fn=lambda a, o, r, d: 1.0)
    m2 = trainer.update(traj)
    assert np.isfinite(m2["aux_v_loss"]) and np.isfinite(m2["aux_clone_kl"])
    assert trainer._aux_buffer == []


def test_ppg_aux_phase_trains_value_without_moving_policy():
    """The aux phase in isolation: value fit on the buffered rollouts
    improves, while the clone KL keeps the policy pinned.  (The EWMA stats
    are constant inside the phase, so pre/post MSE are comparable.)"""
    import jax.numpy as jnp

    from vpt_tpu.models.heads import ewma_normalize

    # aux never auto-triggers: we call _aux_phase directly around probes
    trainer = _make_trainer(b=2, rollout_len=8, n_minibatches=1,
                            aux_phase_every=1000, aux_epochs=6, beta_clone=1.0,
                            learning_rate=1e-3)
    envs = _envs(2)
    rng = np.random.default_rng(3)
    obs = firsts = None
    for _ in range(2):
        traj, obs, firsts = trainer.collect(
            envs, obs, firsts, reward_fn=lambda a, o, r, d: float(rng.normal())
        )
        trainer.update(traj)
    entries = list(trainer._aux_buffer)
    assert len(entries) == 2

    def value_mse(entry):
        out, _ = jax.jit(trainer.policy.apply)(
            trainer.variables, jnp.asarray(entry["frames"]),
            jnp.asarray(entry["firsts"]), entry["initial_state"],
        )
        target = ewma_normalize(
            jax.tree.map(jnp.asarray, trainer.variables["stats"])["value_head"],
            jnp.asarray(entry["returns"])[..., None],
        )
        return float(jnp.mean((out["vpred_raw"].astype(jnp.float32) - target) ** 2))

    probe = np.random.default_rng(0).integers(0, 255, (2, 4, 32, 32, 3), dtype=np.uint8)
    pre_mse = sum(value_mse(e) for e in entries)
    p_pre = _attack_prob(trainer, probe)

    aux = trainer._aux_phase()
    assert trainer._aux_buffer == []

    post_mse = sum(value_mse(e) for e in entries)
    assert post_mse < pre_mse, (pre_mse, post_mse)
    # the clone KL held the policy in place through 6 epochs of trunk updates
    assert aux["aux_clone_kl"] < 0.05, aux
    p_post = _attack_prob(trainer, probe)
    assert abs(p_post - p_pre) < 0.02, (p_pre, p_post)


def test_update_recompute_matches_collection_with_mid_window_resets():
    """With episodes ending MID rollout-window, the update's chunkwise
    re-forward must reproduce collection's stepwise log-probs exactly
    (per-timestep firsts flow through clipped_causal_mask): at lr=0 the
    first PPO epoch sees ratio == 1 everywhere."""
    hp = PPOHyperparams(rollout_len=6, n_minibatches=1, n_epochs=1,
                        learning_rate=0.0, normalize_advantages=False)
    trainer = PPOTrainer(TINY_KWARGS, {"temperature": 2.0}, hp=hp,
                         mesh=make_mesh(n_dp=1, devices=jax.devices()[:1]), seed=0)
    trainer.init()
    envs = _envs(4, done_prob=0.4)
    traj, _, _ = trainer.collect(envs, reward_fn=lambda a, o, r, d: 1.0)
    assert traj["firsts"][:, 1:].any(), "fixture must contain mid-window resets"
    metrics = trainer.update(traj)
    assert metrics["approx_kl"] < 1e-6, metrics["approx_kl"]
    assert metrics["clip_frac"] == 0.0, metrics["clip_frac"]


@pytest.mark.parametrize("groups", [1, 2])
def test_collect_snapshot_reforward_consistency(groups):
    """The window-snapshot contract the update path depends on: chunkwise
    re-forwarding the collected frames from ``initial_state`` must reproduce
    the logp/vpred recorded during stepped collection — including with
    pipelined grouped collection (per-group snapshots concatenated) and
    mid-stream episode resets."""
    import jax.numpy as jnp

    from vpt_tpu.models.heads import dict_logprob

    trainer = _make_trainer(b=4, rollout_len=6, n_minibatches=1,
                            n_collect_groups=groups)
    envs = _envs(4, done_prob=0.3)
    traj, obs, firsts = trainer.collect(envs)
    # second window starts from carried mid-stream state → snapshot nontrivial
    traj, obs, firsts = trainer.collect(envs, obs, firsts)
    assert traj["frames"].shape == (4, 6, 32, 32, 3)

    out, _ = trainer.policy.apply(
        trainer.variables, jnp.asarray(traj["frames"]),
        jnp.asarray(traj["firsts"]), traj["initial_state"],
    )
    actions = {
        "buttons": jnp.asarray(traj["buttons"])[..., None],
        "camera": jnp.asarray(traj["camera"])[..., None],
    }
    logp = dict_logprob(out["pi_logits"], actions, trainer.head_specs)
    np.testing.assert_allclose(np.asarray(logp), traj["logp_old"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["vpred"][..., 0]), traj["values"], rtol=1e-4, atol=1e-5
    )


def test_grouped_collect_update_end_to_end():
    """Grouped collection feeds the (unchanged) update path: metrics finite,
    buffer layout intact."""
    trainer = _make_trainer(b=4, rollout_len=6, n_minibatches=2,
                            n_collect_groups=2)
    envs = _envs(4, done_prob=0.2)
    traj, _, _ = trainer.collect(envs, reward_fn=lambda a, o, r, d: 1.0)
    assert np.all(traj["rewards"] == 1.0)
    metrics = trainer.update(traj)
    for key in ("loss", "pg_loss", "v_loss", "approx_kl", "clip_frac"):
        assert np.isfinite(metrics[key]), (key, metrics)


def test_groups_to_process_major_pairs_rows():
    """The multi-host G>1 state permutation: encode each collected-state row
    as (group, process, local_index) in group-major concat order — the
    permuted rows must follow the update batch's process-major layout
    ([h0: g0,g1 | h1: g0,g1]), and G==1 / nproc==1 must be identities."""
    import jax.numpy as jnp

    from vpt_tpu.training.rl import groups_to_process_major

    G, P, gb = 3, 2, 4
    rows = np.asarray([
        [g, p, i] for g in range(G) for p in range(P) for i in range(gb)
    ], np.int32)
    got = np.asarray(groups_to_process_major(jnp.asarray(rows), G, P, gb))
    want = np.asarray([
        [g, p, i] for p in range(P) for g in range(G) for i in range(gb)
    ], np.int32)
    np.testing.assert_array_equal(got, want)

    # identities (single group / single process)
    for g_, p_ in ((1, 4), (4, 1)):
        n = g_ * p_ * 2
        x = jnp.arange(n * 3).reshape(n, 3)
        np.testing.assert_array_equal(
            np.asarray(groups_to_process_major(x, g_, p_, 2)), np.asarray(x)
        )


# ---------------------------------------------------------------- evaluation


def test_evaluate_report_and_shaped_reward():
    trainer = _make_trainer(b=2, rollout_len=4)
    envs = _envs(2, done_prob=0.2)
    # +1 per step under the shaped reward → every return equals its length
    report = trainer.evaluate(envs, n_episodes=4, max_episode_steps=10,
                              reward_fn=lambda a, o, r, d: 1.0)
    assert report["episodes"] == 4
    for ep in report["per_episode"]:
        assert ep["return"] == ep["length"]
    assert report["mean_vpred"] is not None
    assert 0.0 <= report["action_stats"]["null_action_rate"] <= 1.0
    # deterministic (argmax) path compiles and runs too
    det = trainer.evaluate(envs, n_episodes=2, max_episode_steps=5,
                           stochastic=False)
    assert det["episodes"] == 2


def test_evaluate_does_not_perturb_training():
    def run(with_eval: bool):
        trainer = _make_trainer(b=2, rollout_len=4)
        envs = _envs(2)
        if with_eval:
            trainer.evaluate(_envs(2, done_prob=0.3), n_episodes=2,
                             max_episode_steps=8)
        traj, obs, firsts = trainer.collect(envs, reward_fn=lambda a, o, r, d: 1.0)
        trainer.update(traj)
        if with_eval:
            trainer.evaluate(_envs(2, done_prob=0.3), n_episodes=2,
                             max_episode_steps=8)
        traj2, _, _ = trainer.collect(envs, obs, firsts,
                                      reward_fn=lambda a, o, r, d: 1.0)
        return traj, traj2, trainer

    traj_a, traj2_a, tr_a = run(False)
    traj_b, traj2_b, tr_b = run(True)
    # evaluation must consume neither the trainer's rng nor its env/recurrent
    # state: both runs collect the same actions and land on the same params
    np.testing.assert_array_equal(traj_a["buttons"], traj_b["buttons"])
    np.testing.assert_array_equal(traj2_a["buttons"], traj2_b["buttons"])
    a_leaves = jax.tree.leaves(tr_a.variables["params"])
    b_leaves = jax.tree.leaves(tr_b.variables["params"])
    for la, lb in zip(a_leaves, b_leaves):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_train_logs_eval_events():
    import io
    import json

    from vpt_tpu.utils.metrics import MetricsLogger

    trainer = _make_trainer(b=2, rollout_len=4)
    out = io.StringIO()
    trainer.train(
        _envs(2), 2, reward_fn=lambda a, o, r, d: 1.0,
        metrics=MetricsLogger(stream=out),
        eval_envs=_envs(2, done_prob=0.3), eval_every=2,
        eval_episodes=2, eval_max_steps=6,
    )
    evals = [json.loads(l) for l in out.getvalue().splitlines()
             if '"eval"' in l]
    # baseline before update 0 + the eval_every=2 hit after update 2
    assert [e["update"] for e in evals] == [0, 2]
    for e in evals:
        assert e["episodes"] == 2 and np.isfinite(e["mean_return"])
