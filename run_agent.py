"""Run the VPT policy in a MineRL environment (reference: run_agent.py).

CLI-compatible with the reference (--model/--weights); because the Java MineRL
env may not exist on a TPU host, ``--mock-env`` drives the full policy loop on
synthetic frames instead (useful for smoke tests and throughput checks).
"""

from argparse import ArgumentParser

import numpy as np

from vpt_tpu.agent import MineRLAgent
from vpt_tpu.checkpoint import load_model_parameters


def _make_recorder(path, height, width):
    """Annotated POV recorder: the headless stand-in for the reference's live
    ``env.render()`` window (reference run_agent.py:24) — writes stream 0's
    observed frames with the sampled action overlaid, via the native encoder."""
    from vpt_tpu.data.annotate import action_rows, annotate_frame
    from vpt_tpu.data.video import VideoWriter

    writer = VideoWriter(path, width, height, fps=20)
    frames = {"n": 0}

    def write(action, obs):
        writer.write(annotate_frame(obs["pov"], action_rows(action)))
        frames["n"] += 1

    write.frames = frames
    return write, writer


def main(model, weights, mock_env=False, steps=100, streams=1, groups=0, show=True,
         mesh_dp=0, record=None):
    policy_kwargs, pi_head_kwargs = load_model_parameters(model)

    mesh = None
    if mesh_dp:
        # multi-chip serving: params replicated, stream axis + KV caches
        # sharded over dp (agent/agent.py mesh=)
        if not mock_env and mesh_dp > 1:
            raise SystemExit(
                "--mesh-dp > 1 needs a stream axis to shard: the interactive "
                "MineRL path drives ONE env.  Use --mock-env --streams N "
                "(N divisible by mesh-dp), or batch real envs via MineRLAgent "
                "directly."
            )
        from vpt_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_dp=mesh_dp)

    if mock_env:
        from vpt_tpu.agent.rollout import (
            BatchedRolloutRunner,
            GroupedRolloutRunner,
            MockMinecraftEnv,
        )

        # pipelined serving by default: round-robin groups hide the device
        # round trip behind host work (0 = auto: 4 groups when they divide
        # the streams, else single-group; with --mesh-dp the per-group batch
        # must also divide over the dp axis)
        if record and groups > 1:
            raise SystemExit(
                "--record taps the unpipelined runner's per-step callback; "
                "use it without --groups (or with --groups 1)."
            )
        if groups == 0:
            if record:
                groups = 1  # recording wants the per-step (action, obs) hook
            else:
                for g in (4, 2, 1):
                    if streams % g == 0 and (streams // g) % max(mesh_dp, 1) == 0 \
                            and (g == 1 or streams >= 2 * g):
                        groups = g
                        break
        if mesh_dp and (streams // groups) % mesh_dp != 0:
            raise SystemExit(
                f"streams/groups = {streams // groups} must divide over the "
                f"{mesh_dp}-device dp mesh; adjust --streams or --groups"
            )
        print(f"---Loading model (mock env, {streams} stream{'s' if streams > 1 else ''}, {groups} group{'s' if groups > 1 else ''})---")
        agent = MineRLAgent(
            policy_kwargs=policy_kwargs,
            pi_head_kwargs=pi_head_kwargs,
            batch_size=streams // groups,
            compute_dtype="bfloat16" if streams > 1 else "float32",
            mesh=mesh,
        )
        agent.load_weights(weights)
        print("---Running mock rollout---")
        envs = [MockMinecraftEnv(seed=i) for i in range(streams)]
        if groups > 1:
            runner = GroupedRolloutRunner(agent, envs, n_groups=groups)
            stats = runner.run(steps)
        else:
            runner = BatchedRolloutRunner(agent, envs)
            shown = {"n": 0}
            rec_write = rec_writer = None
            if record:
                pov = runner.obs[0]["pov"]
                rec_write, rec_writer = _make_recorder(record, pov.shape[0], pov.shape[1])

            def preview(actions, obs):
                a = actions[0] if isinstance(actions, list) else actions
                if rec_write is not None:
                    rec_write(a, obs[0])
                if show and shown["n"] < 3:
                    pressed = [k for k, v in a.items() if k != "camera" and v == 1]
                    print(f"step {shown['n']}: pressed={pressed} camera={np.round(a['camera'], 2)}")
                    shown["n"] += 1

            try:
                stats = runner.run(steps, on_step=preview)
            finally:
                if rec_writer is not None:
                    rec_writer.close()
                    # frames actually written (a partial run records fewer
                    # than the requested step count)
                    print(f"recorded {rec_write.frames['n']} annotated frames to {record}")
        lat = stats.get("latency") or {}
        print(
            f"{stats['frames']} env frames in {stats['seconds']:.2f}s → "
            f"{stats['frames_per_sec']:.1f} frames/sec end-to-end"
            + (
                f" (step latency p50 {lat['p50_ms']:.1f} ms / p99 {lat['p99_ms']:.1f} ms, "
                f"{lat['realtime_factor_p99']:.2f}x the 20 Hz budget at p99)"
                if lat else ""
            )
        )
        return

    import gym
    import minerl  # noqa: F401  (registers MineRL envs)
    from minerl.herobraine.env_specs.human_survival_specs import HumanSurvival

    from vpt_tpu.agent.agent import ENV_KWARGS

    env = HumanSurvival(**ENV_KWARGS).make()
    print("---Loading model---")
    agent = MineRLAgent(env, policy_kwargs=policy_kwargs, pi_head_kwargs=pi_head_kwargs,
                        mesh=mesh)
    agent.load_weights(weights)

    print("---Launching MineRL environment (be patient)---")
    obs = env.reset()
    rec_write = rec_writer = None
    if record:
        pov = obs["pov"]
        rec_write, rec_writer = _make_recorder(record, pov.shape[0], pov.shape[1])
    try:
        while True:
            minerl_action = agent.get_action(obs)
            if rec_write is not None:
                rec_write(minerl_action, obs)
            obs, reward, done, info = env.step(minerl_action)
            env.render()
    finally:
        if rec_writer is not None:
            rec_writer.close()
            print(f"recorded {rec_write.frames['n']} annotated frames of gameplay to {record}")


if __name__ == "__main__":
    parser = ArgumentParser("Run pretrained models on MineRL environment")
    parser.add_argument("--weights", type=str, required=True, help="Path to the '.weights' file to be loaded.")
    parser.add_argument("--model", type=str, required=True, help="Path to the '.model' file to be loaded.")
    parser.add_argument("--mock-env", action="store_true", help="Run on synthetic frames (no MineRL needed).")
    parser.add_argument("--steps", type=int, default=100, help="Mock-env step count.")
    parser.add_argument("--streams", type=int, default=1, help="Parallel env streams (batched rollout runtime).")
    parser.add_argument("--groups", type=int, default=0,
                        help="Pipelined stream groups (0 = auto; 1 disables pipelining).")
    parser.add_argument("--mesh-dp", type=int, default=0,
                        help="Shard the stream axis + KV caches over an N-device dp mesh "
                             "(multi-chip serving; 0 = single device).")
    parser.add_argument("--record", type=str, default=None,
                        help="Write stream 0's POV with the sampled action overlaid to "
                             "this mp4 (headless replacement for the live render window).")

    args = parser.parse_args()
    main(args.model, args.weights, mock_env=args.mock_env, steps=args.steps,
         streams=args.streams, groups=args.groups, mesh_dp=args.mesh_dp,
         record=args.record)
