"""RL fine-tuning of a VPT policy: KL-anchored PPO (training/rl.py).

The reference release ships RL-fine-tuned checkpoints (README.md:63-79) but
no RL code; this CLI supplies the loop.  It mirrors behavioural_cloning.py's
flag contract (--in-model/--in-weights/--out-weights) and drives batched env
streams.  On hosts without the Java MineRL env, ``--mock-env`` runs the full
pipeline on synthetic frames with a demo reward (+1 per attack press) so the
loop is exercisable anywhere.

Example:
    python rl_fine_tune.py --in-model foundation-model-1x.model \
        --in-weights foundation-model-1x.weights \
        --out-weights rl-tuned.weights --mock-env --streams 8 --updates 50
"""

from argparse import ArgumentParser

from vpt_tpu.training.rl import PPOHyperparams, PPOTrainer
from vpt_tpu.utils.metrics import MetricsLogger


def demo_attack_reward(env_action, obs, reward, done):
    """Synthetic reward for --mock-env: +1 whenever attack is pressed."""
    return float(env_action["attack"])


def main(in_model, in_weights, out_weights, mock_env=False, streams=8,
         updates=50, rollout_len=40, learning_rate=3e-5, kl_coef=0.2,
         compute_dtype="bfloat16", metrics_path=None, checkpoint_dir=None,
         checkpoint_every=0, resume=False, aux_phase_every=0, aux_epochs=4,
         beta_clone=1.0, fsdp=1, tp=1, collect_groups=0,
         eval_every=0, eval_episodes=8, eval_streams=4, eval_max_steps=500,
         eval_record_dir=None):
    from vpt_tpu.parallel.mesh import maybe_initialize_distributed

    # multi-host pod launch: each host runs ITS OWN --streams envs and
    # contributes them to the global PPO batch (must precede any backend use)
    maybe_initialize_distributed()
    import jax as _jax

    mesh = None
    if fsdp > 1 or tp > 1:
        from vpt_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_fsdp=fsdp, n_tp=tp)
    if collect_groups == 0:
        # auto: pipeline collection as round-robin groups when they divide
        # the stream axis AND the per-group LOCAL batch still divides over
        # this host's data-parallel devices (measured +98% collect
        # throughput, docs/ROADMAP.md)
        import numpy as _np

        from vpt_tpu.parallel.mesh import make_mesh as _mm

        m = mesh if mesh is not None else _mm()
        n_data = int(_np.prod([m.shape[a] for a in ("dp", "fsdp") if a in m.axis_names]))
        n_data_local = max(n_data // _jax.process_count(), 1)
        if mesh is None:
            mesh = m  # reuse: a second make_mesh() would re-derive identically
        collect_groups = 1
        for g in (4, 2):
            if streams % g == 0 and streams >= 2 * g and (streams // g) % n_data_local == 0:
                collect_groups = g
                break
    hp = PPOHyperparams(
        rollout_len=rollout_len,
        learning_rate=learning_rate,
        kl_coef=kl_coef,
        n_minibatches=2 if streams % 2 == 0 else 1,
        n_collect_groups=collect_groups,
        aux_phase_every=aux_phase_every,
        aux_epochs=aux_epochs,
        beta_clone=beta_clone,
    )
    trainer = PPOTrainer.from_files(
        in_model, in_weights, hp=hp, compute_dtype=compute_dtype, mesh=mesh
    )

    eval_envs = None
    if mock_env:
        from vpt_tpu.agent.rollout import MockMinecraftEnv

        envs = [
            MockMinecraftEnv(seed=_jax.process_index() * streams + i)
            for i in range(streams)
        ]
        reward_fn = demo_attack_reward
        if eval_every > 0:
            # dedicated eval streams (done_prob so episodes actually end)
            eval_envs = [
                MockMinecraftEnv(seed=10_000 + i, done_prob=0.02)
                for i in range(eval_streams)
            ]
    else:
        import gym  # the Java MineRL env; only on hosts that have it

        envs = [gym.make("MineRLBasaltFindCave-v0") for _ in range(streams)]
        reward_fn = None  # the env's own reward
        if eval_every > 0:
            eval_envs = [gym.make("MineRLBasaltFindCave-v0") for _ in range(eval_streams)]
    if eval_envs is not None and _jax.process_count() > 1:
        # evaluate() is single-process (episode lengths are data-dependent,
        # so per-host act counts diverge); skip it on pod launches
        print("---eval-every ignored on multi-host launches---")
        eval_envs = None

    print(f"---Running PPO: {streams} streams × {rollout_len} steps/update "
          f"({hp.n_collect_groups} collection group(s)), {updates} updates, "
          f"KL anchor ρ₀={kl_coef}---")
    report = trainer.train(
        envs, updates, out_weights=out_weights, reward_fn=reward_fn,
        metrics=MetricsLogger(path=metrics_path),
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
        resume=resume,
        eval_envs=eval_envs, eval_every=eval_every,
        eval_episodes=eval_episodes, eval_max_steps=eval_max_steps,
        eval_record_dir=eval_record_dir,
    )
    print(f"Done: {report}")


if __name__ == "__main__":
    parser = ArgumentParser("KL-anchored PPO fine-tuning of a VPT policy.")
    parser.add_argument("--in-model", required=True, type=str, help="Path to the .model file of the policy to fine-tune.")
    parser.add_argument("--in-weights", required=True, type=str, help="Path to the .weights file (also the frozen KL anchor).")
    parser.add_argument("--out-weights", required=True, type=str, help="Path where finetuned weights will be saved.")
    parser.add_argument("--mock-env", action="store_true", help="Use synthetic envs with the demo attack reward (no Java).")
    parser.add_argument("--streams", type=int, default=8,
                        help="Parallel env streams (PER HOST on a multi-host launch).")
    parser.add_argument("--updates", type=int, default=50, help="collect+update cycles.")
    parser.add_argument("--rollout-len", type=int, default=40, help="Steps collected per stream per update.")
    parser.add_argument("--learning-rate", type=float, default=3e-5)
    parser.add_argument("--kl-coef", type=float, default=0.2, help="Initial weight of KL(foundation ‖ policy).")
    parser.add_argument("--compute-dtype", default="bfloat16", choices=["float32", "bfloat16"])
    parser.add_argument("--metrics-path", type=str, default=None, help="Append JSONL metrics here.")
    parser.add_argument("--checkpoint-dir", type=str, default=None, help="Preemption-safe checkpoints here (policy + anchor + optimizer + anneal state).")
    parser.add_argument("--checkpoint-every", type=int, default=0, help="Updates between checkpoints (0 = only on SIGTERM/SIGINT).")
    parser.add_argument("--resume", action="store_true", help="Continue from the newest checkpoint in --checkpoint-dir.")
    parser.add_argument("--aux-phase-every", type=int, default=0, help="PPG: run the auxiliary (value + clone-KL) phase every N updates (0 = plain PPO).")
    parser.add_argument("--aux-epochs", type=int, default=4, help="PPG: epochs over the buffered rollouts per aux phase.")
    parser.add_argument("--beta-clone", type=float, default=1.0, help="PPG: weight of the KL that pins the policy during the aux phase.")
    parser.add_argument("--fsdp", type=int, default=1,
                        help="ZeRO-3 axis size: shard policy + anchor + Adam moments over this many chips.")
    parser.add_argument("--tp", type=int, default=1, help="Tensor-parallel axis size.")
    parser.add_argument("--collect-groups", type=int, default=0,
                        help="Round-robin collection groups pipelining host work "
                             "against device steps (0 = auto: 4 when they divide "
                             "the streams; 1 = serial).")
    parser.add_argument("--eval-every", type=int, default=0,
                        help="Evaluate on dedicated env streams before training and "
                             "every N updates, logging event=\"eval\" metric lines "
                             "(0 = off).")
    parser.add_argument("--eval-episodes", type=int, default=8, help="Episodes per evaluation.")
    parser.add_argument("--eval-streams", type=int, default=4, help="Dedicated eval env streams.")
    parser.add_argument("--eval-max-steps", type=int, default=500,
                        help="Force-reset (truncate) eval episodes at this length.")
    parser.add_argument("--eval-record-dir", type=str, default=None,
                        help="Save an annotated POV video of each evaluation "
                             "(eval-<update>.mp4) here.")
    args = parser.parse_args()
    main(
        args.in_model, args.in_weights, args.out_weights, mock_env=args.mock_env,
        streams=args.streams, updates=args.updates, rollout_len=args.rollout_len,
        learning_rate=args.learning_rate, kl_coef=args.kl_coef,
        compute_dtype=args.compute_dtype, metrics_path=args.metrics_path,
        checkpoint_dir=args.checkpoint_dir, checkpoint_every=args.checkpoint_every,
        resume=args.resume, aux_phase_every=args.aux_phase_every,
        aux_epochs=args.aux_epochs, beta_clone=args.beta_clone,
        fsdp=args.fsdp, tp=args.tp, collect_groups=args.collect_groups,
        eval_every=args.eval_every, eval_episodes=args.eval_episodes,
        eval_streams=args.eval_streams, eval_max_steps=args.eval_max_steps,
        eval_record_dir=args.eval_record_dir,
    )
