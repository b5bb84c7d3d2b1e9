"""vpt_tpu — a TPU-native (JAX / XLA / Pallas / pjit) re-implementation of the
capabilities of openai/Video-Pre-Training.

Layer map (mirrors the conceptual layers of the reference, see SURVEY.md §1):

  cli/        run_agent, run_inverse_dynamics_model, behavioural_cloning entry points
  agent/      MineRLAgent / IDMAgent wrappers (env I/O, persistent hidden state)
  data/       mp4+jsonl contractor-data pipeline (native decode, fixups, batching)
  actions/    camera quantizer, action transformer, hierarchical action mapping
  models/     policy / IDM model graphs (flax.linen, functional state carries)
  ops/        attention (XLA + Pallas kernels), masks, relative bias, resize
  parallel/   device mesh, sharding rules, pjit'd training/inference steps
  training/   behavioural-cloning trainer (sequence-chunked, data-parallel)
  checkpoint/ torch .model/.weights import, native orbax checkpoints
  native/     C++ host-side data plane (video decode, resize, compositing)
"""

__version__ = "0.1.0"
