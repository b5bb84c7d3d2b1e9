from vpt_tpu.training.bc import BCTrainer, BCHyperparams
from vpt_tpu.training.rl import PPOTrainer, PPOHyperparams, compute_gae

__all__ = ["BCTrainer", "BCHyperparams", "PPOTrainer", "PPOHyperparams", "compute_gae"]
