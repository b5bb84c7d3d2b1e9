from vpt_tpu.training.bc import BCTrainer, BCHyperparams

__all__ = ["BCTrainer", "BCHyperparams"]
