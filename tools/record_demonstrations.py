"""Record agent play as contractor-format mp4+jsonl demonstration pairs.

The VPT data pipeline consumes "contractor data": a 640×360 mp4 plus a
recorder jsonl with one step per frame (reference README.md:300-343,
data_loader.py:97).  The reference documents that format and ships the
consumer, but no producer.  This tool closes the loop: it rolls a policy
over batched env streams and writes each stream as an mp4+jsonl pair in
exactly that format — so ``behavioural_cloning.py --data-dir`` (and
``inverse_dynamics_train.py``) can train on the agent's own play
(self-distillation, DAgger-style aggregation, or synthetic fixtures).

    python tools/record_demonstrations.py --model 2x.model --weights 2x.weights \
        --out-dir demos/ --mock-env --streams 4 --steps 1200

Each stream yields ``<prefix>-<i>.mp4`` + ``<prefix>-<i>.jsonl`` where jsonl
row t holds the action taken AT frame t (the contractor alignment).  Two
format caveats, both inherited from the reference's fixup heuristics
(data_loader.py:64-103): a recording whose very first step presses attack is
read back as "stuck attack" and stripped until the next fresh press, and
sub-degree camera motion truncates to whole degrees on parse — real
contractor recordings lose both the same way.
"""

from __future__ import annotations

import json
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vpt_tpu.actions.json_actions import RecorderJsonlWriter  # noqa: E402


def record(agent, envs, n_steps: int, out_dir: str, prefix: str = "demo") -> list:
    """Roll ``envs`` (len == agent.batch_size) for ``n_steps`` and write one
    contractor-format mp4+jsonl pair per stream.  Returns the per-stream
    lists of env actions taken (in order), for verification.

    Streams are recorded as single continuous segments (the contractor
    format has no episode markers); pass envs that do not reset mid-run.
    """
    from vpt_tpu.agent.rollout import BatchedRolloutRunner
    from vpt_tpu.data.video import VideoWriter

    os.makedirs(out_dir, exist_ok=True)
    runner = BatchedRolloutRunner(agent, envs)
    b = len(envs)
    h, w = runner.obs[0]["pov"].shape[:2]

    writers, jsonls, recorders, taken = [], [], [], [[] for _ in range(b)]
    for i in range(b):
        base = os.path.join(out_dir, f"{prefix}-{i}")
        writers.append(VideoWriter(base + ".mp4", w, h, fps=20))
        jsonls.append(open(base + ".jsonl", "w"))
        recorders.append(RecorderJsonlWriter())

    def on_step(actions, obs):
        for i in range(b):
            writers[i].write(obs[i]["pov"])
            row = recorders[i].step(actions[i])
            jsonls[i].write(json.dumps(row) + "\n")
            taken[i].append(actions[i])

    try:
        runner.run(n_steps, on_step=on_step)
    finally:
        for vw, jf in zip(writers, jsonls):
            vw.close()
            jf.close()
    return taken


def main(model, weights, out_dir, steps=1200, streams=1, mock_env=False,
         prefix="demo"):
    from vpt_tpu.agent import MineRLAgent
    from vpt_tpu.checkpoint import load_model_parameters

    policy_kwargs, pi_head_kwargs = load_model_parameters(model)
    agent = MineRLAgent(policy_kwargs=policy_kwargs, pi_head_kwargs=pi_head_kwargs,
                        batch_size=streams)
    agent.load_weights(weights)

    if mock_env:
        from vpt_tpu.agent.rollout import MockMinecraftEnv

        envs = [MockMinecraftEnv(seed=i) for i in range(streams)]
    else:
        import gym
        import minerl  # noqa: F401
        from minerl.herobraine.env_specs.human_survival_specs import HumanSurvival

        from vpt_tpu.agent.agent import ENV_KWARGS

        envs = [HumanSurvival(**ENV_KWARGS).make() for _ in range(streams)]

    record(agent, envs, steps, out_dir, prefix=prefix)
    print(f"recorded {streams} stream(s) x {steps} frames to {out_dir}/{prefix}-*.mp4/.jsonl")


if __name__ == "__main__":
    ap = ArgumentParser("Record agent play as contractor-format demonstrations.")
    ap.add_argument("--model", type=str, required=True)
    ap.add_argument("--weights", type=str, required=True)
    ap.add_argument("--out-dir", type=str, required=True)
    ap.add_argument("--steps", type=int, default=1200,
                    help="Frames per stream (contractor segments are 5 min = 6000).")
    ap.add_argument("--streams", type=int, default=1)
    ap.add_argument("--mock-env", action="store_true")
    ap.add_argument("--prefix", type=str, default="demo")
    args = ap.parse_args()
    main(args.model, args.weights, args.out_dir, steps=args.steps,
         streams=args.streams, mock_env=args.mock_env, prefix=args.prefix)
