"""Test harness config: force CPU JAX with 8 virtual devices so sharding /
data-parallel logic is testable without TPU hardware (the TPU-world analogue
of a fake backend — see SURVEY.md §4).

NOTE: this image presets JAX_PLATFORMS=axon (a single experimental TPU
platform) and the plugin wins over the env var, so the override must go
through jax.config after import.
"""

import os

# single-core host: data-loader workers can be starved while other tests
# compile; give queue waits generous headroom to avoid flaky timeouts
os.environ.setdefault("VPT_QUEUE_TIMEOUT", "60")

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache makes repeated suite runs much faster
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vpt")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for the suite"

# ---------------------------------------------------------------------------
# Test tiering: the multi-minute cluster/streaming/e2e/full-width tests carry
# the ``slow`` marker so the sub-minute unit tier can gate quick iterations:
#
#   pytest -m "not slow" tests/      # quick tier, ~4-5 min on this host
#   pytest tests/                    # everything (~25 min warm-cache)
#
# Central list (instead of per-file marks) so the tier assignment lives next
# to the measured durations that justify it (round-4 run, warm compile
# cache, 1-core host).  Whole files marked via their own ``pytestmark``
# (test_full_geometry_parity.py) also stay slow.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_SLOW_FILES = {
    "test_distributed.py",          # real 2-process jax.distributed clusters, 70-400s each
    "test_full_geometry_parity.py", # full-width (hidsize 2048/4096) torch+JAX forwards
    "test_grad_parity.py",          # full torch autograd oracle, ~30s
    "test_bc_loss_curve_parity.py", # drives the reference trainer end to end, ~12s
}
_SLOW_TESTS = {  # individual tests >10s (measured durations in comments)
    "test_idm_training.py::test_idm_pipeline_round_trip",               # 32s
    "test_rl.py::test_ppo_dp_mesh_smoke",                               # 20s
    "test_fsdp.py::test_fsdp_training_matches_single_device",           # 20s
    "test_rl.py::test_ppo_learns_synthetic_reward",                     # 16s
    "test_rl.py::test_evaluate_does_not_perturb_training",              # 16s
    "test_remat.py::test_remat_forward_and_grad_match",                 # 16s
    "test_data_loader.py::test_sequence_loader_sharding_partitions_the_global_batch",  # 16s
    "test_data_loader.py::test_sequence_loader_shard_resume_cursor",    # 14s
    "test_rl.py::test_ppg_aux_phase_trains_value_without_moving_policy",  # 14s
    "test_rl.py::test_ppo_checkpoint_resume",                           # 14s
    "test_rl.py::test_ppo_fsdp_update_matches_single_device",           # 13s
    "test_rl.py::test_kl_anchor_restrains_drift",                       # 13s
    "test_fsdp.py::test_fsdp_composes_with_tp",                         # 13s
    "test_data_loader.py::test_sequence_loader_mid_trajectory_resume",  # 12s
    "test_data_loader.py::test_sequence_loader_resume_at_trajectory_boundary",  # 12s
    "test_int8.py::test_qat_bc_train_step_runs_and_matches_serving_weights",    # 12s
    "test_pseudo_labels.py::test_full_pipeline_label_then_bc",          # 11s
    "test_bc_parity.py::test_bf16_forward_tracks_f32",                  # 11s
    "test_pp_bc.py::test_pp_bc_step_matches_standard_trainer",          # 11s
    "test_tp.py::test_tp_forward_matches_replicated",                   # 11s
    "test_bc_parity.py::test_t1_loss_equals_reference_accumulation",    # 11s
    "test_kv_cache.py::test_stepwise_equals_chunkwise",                 # 10s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        key = f"{fname}::{item.name.split('[')[0]}"
        if fname in _SLOW_FILES or key in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
