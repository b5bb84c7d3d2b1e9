"""Run the VPT policy in a MineRL environment (reference: run_agent.py).

CLI-compatible with the reference (--model/--weights); because the Java MineRL
env may not exist on a TPU host, ``--mock-env`` drives the full policy loop on
synthetic frames instead (useful for smoke tests and throughput checks).
"""

from argparse import ArgumentParser

import numpy as np

from vpt_tpu.agent import MineRLAgent
from vpt_tpu.checkpoint import load_model_parameters


def main(model, weights, mock_env=False, steps=100, show=True):
    policy_kwargs, pi_head_kwargs = load_model_parameters(model)

    if mock_env:
        print("---Loading model (mock env)---")
        agent = MineRLAgent(policy_kwargs=policy_kwargs, pi_head_kwargs=pi_head_kwargs)
        agent.load_weights(weights)
        print("---Running mock rollout---")
        rng = np.random.default_rng(0)
        import time

        t0 = time.time()
        for i in range(steps):
            obs = {"pov": rng.integers(0, 255, (360, 640, 3), dtype=np.uint8)}
            action = agent.get_action(obs)
            if show and i < 3:
                pressed = [k for k, v in action.items() if k != "camera" and v == 1]
                print(f"step {i}: pressed={pressed} camera={np.round(action['camera'], 2)}")
        dt = time.time() - t0
        print(f"{steps} steps in {dt:.2f}s → {steps / dt:.1f} frames/sec")
        return

    import gym
    import minerl  # noqa: F401  (registers MineRL envs)
    from minerl.herobraine.env_specs.human_survival_specs import HumanSurvival

    from vpt_tpu.agent.agent import ENV_KWARGS

    env = HumanSurvival(**ENV_KWARGS).make()
    print("---Loading model---")
    agent = MineRLAgent(env, policy_kwargs=policy_kwargs, pi_head_kwargs=pi_head_kwargs)
    agent.load_weights(weights)

    print("---Launching MineRL environment (be patient)---")
    obs = env.reset()
    while True:
        minerl_action = agent.get_action(obs)
        obs, reward, done, info = env.step(minerl_action)
        env.render()


if __name__ == "__main__":
    parser = ArgumentParser("Run pretrained models on MineRL environment")
    parser.add_argument("--weights", type=str, required=True, help="Path to the '.weights' file to be loaded.")
    parser.add_argument("--model", type=str, required=True, help="Path to the '.model' file to be loaded.")
    parser.add_argument("--mock-env", action="store_true", help="Run on synthetic frames (no MineRL needed).")
    parser.add_argument("--steps", type=int, default=100, help="Mock-env step count.")

    args = parser.parse_args()
    main(args.model, args.weights, mock_env=args.mock_env, steps=args.steps)
