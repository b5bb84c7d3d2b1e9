from vpt_tpu.agent.agent import MineRLAgent, AGENT_RESOLUTION, ENV_KWARGS, validate_env
from vpt_tpu.agent.evaluation import compare_reports, evaluate_episodes
from vpt_tpu.agent.idm import (IDMAgent, StreamingIDMLabeler,
                               IDM_REQUIRED_RESOLUTION, action_jsonl_row)

__all__ = ["MineRLAgent", "IDMAgent", "StreamingIDMLabeler", "AGENT_RESOLUTION",
           "ENV_KWARGS", "validate_env", "IDM_REQUIRED_RESOLUTION",
           "action_jsonl_row", "evaluate_episodes", "compare_reports"]
