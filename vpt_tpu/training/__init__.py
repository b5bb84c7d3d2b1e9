from vpt_tpu.training.bc import BCTrainer, BCHyperparams
from vpt_tpu.training.idm import IDMTrainer, IDMHyperparams
from vpt_tpu.training.rl import PPOTrainer, PPOHyperparams, compute_gae

__all__ = [
    "BCTrainer", "BCHyperparams", "IDMTrainer", "IDMHyperparams",
    "PPOTrainer", "PPOHyperparams", "compute_gae",
    "PPBCTrainer",
]


def __getattr__(name):
    # lazy: pp_bc pulls in shard_map machinery most sessions never touch
    if name == "PPBCTrainer":
        from vpt_tpu.training.pp_bc import PPBCTrainer

        return PPBCTrainer
    raise AttributeError(name)
