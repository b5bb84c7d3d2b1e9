"""Evaluate a policy over N episodes: returns, lengths, action statistics.

The reference has no evaluation story (run_agent.py just plays forever in a
window); this is the missing "did my fine-tune help?" tool.  Rolls batched
env streams through the serving runtime until --episodes finish and prints
one JSON report: per-episode returns/lengths, aggregate action statistics
(button press rates, camera movement, null-action rate), mean value-head
prediction, and serving-latency percentiles vs the 20 Hz env tick.

Usage (mock envs — infra check / action-distribution sanity):
    python tools/eval_agent.py --mock-env --episodes 16 \
        [--model X.model --weights X.weights] [--streams 8] \
        [--max-episode-steps 500] [--deterministic] [--done-prob 0.01]

Against real MineRL (where installed), build envs yourself and call
``vpt_tpu.agent.evaluate_episodes`` — env construction/task choice (which
BASALT task, what reward) is deployment-specific by design.

Compare two runs (before/after a fine-tune):
    python tools/eval_agent.py --compare before.json after.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", type=str, default=None, help=".model file (optional; foundation defaults otherwise)")
    ap.add_argument("--weights", type=str, default=None, help=".weights file (optional; random init otherwise)")
    ap.add_argument("--mock-env", action="store_true", required=False)
    ap.add_argument("--episodes", type=int, default=16)
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--max-episode-steps", type=int, default=500)
    ap.add_argument("--done-prob", type=float, default=0.01,
                    help="mock env: per-step episode-end probability")
    ap.add_argument("--deterministic", action="store_true",
                    help="argmax actions instead of sampling")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--compute-dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--out", type=str, default=None, help="also write the report to this path")
    ap.add_argument("--record", type=str, default=None,
                    help="save stream 0's annotated POV video of the evaluation here")
    ap.add_argument("--compare", nargs=2, metavar=("A_JSON", "B_JSON"),
                    help="compare two saved reports instead of running")
    args = ap.parse_args()

    if args.compare:
        from vpt_tpu.agent import compare_reports

        with open(args.compare[0]) as f:
            a = json.load(f)
        with open(args.compare[1]) as f:
            b = json.load(f)
        print(json.dumps(compare_reports(a, b)))
        return

    if not args.mock_env:
        raise SystemExit(
            "only --mock-env is wired as a CLI (the Java MineRL env and its "
            "task/reward choice are deployment-specific); for real envs call "
            "vpt_tpu.agent.evaluate_episodes(agent, envs, ...) directly"
        )

    from vpt_tpu.agent import MineRLAgent, evaluate_episodes
    from vpt_tpu.agent.rollout import MockMinecraftEnv

    policy_kwargs = pi_head_kwargs = None
    if args.model:
        from vpt_tpu.checkpoint import load_model_parameters

        policy_kwargs, pi_head_kwargs = load_model_parameters(args.model)

    agent = MineRLAgent(
        policy_kwargs=policy_kwargs,
        pi_head_kwargs=pi_head_kwargs,
        batch_size=args.streams,
        seed=args.seed,
        compute_dtype=args.compute_dtype,
    )
    if args.weights:
        agent.load_weights(args.weights)

    envs = [
        MockMinecraftEnv(seed=args.seed * 1000 + i, done_prob=args.done_prob)
        for i in range(args.streams)
    ]
    report = evaluate_episodes(
        agent,
        envs,
        n_episodes=args.episodes,
        max_episode_steps=args.max_episode_steps,
        stochastic=not args.deterministic,
        record_path=args.record,
    )
    line = json.dumps(report)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
