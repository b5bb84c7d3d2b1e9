from vpt_tpu.models.policy import (
    MinecraftPolicy,
    MinecraftAgentPolicy,
    InverseActionNet,
    InverseActionPolicy,
)
from vpt_tpu.models import heads

__all__ = [
    "MinecraftPolicy",
    "MinecraftAgentPolicy",
    "InverseActionNet",
    "InverseActionPolicy",
    "heads",
]
