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
#   pytest -m "not slow" tests/      # quick tier (measured round 5: 5m23s, 239 tests)
#   pytest tests/                    # everything (~25 min warm-cache)
#
# Central list (instead of per-file marks) so the tier assignment lives next
# to the measured durations that justify it (round-5 ``--durations`` run,
# warm compile cache, 1-core host; the round-5 entries' times were measured
# under ~1.65x contention — solo is ~0.6x the noted figure).  Whole files
# marked via their own ``pytestmark`` (test_full_geometry_parity.py) also
# stay slow.  Entries may name a single parametrization
# (``::test_name[param]``) to keep the cheap params in the quick tier.
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
    # round-5 retier (VERDICT-r4 item 7): the quick tier had crept to ~9 min;
    # everything >=~10s solo moves here to bring it back under ~5 min
    "test_remat.py::test_scan_chunked_remat_forward_and_grad_match",    # 53s
    "test_rl.py::test_collect_snapshot_reforward_consistency[1]",       # 46s ([2] stays quick, 8s)
    "test_training.py::test_mask_excludes_padded_steps",                # 34s
    "test_pp.py::test_pipelined_micro_geometries",                      # 32s
    "test_resume.py::test_save_restore_continue",                       # 30s
    "test_rl.py::test_ppg_aux_phase_schedule",                          # 27s
    "test_ring_cache.py::test_ring_to_linear_conversion_continues_chunkwise",  # 27s
    "test_sp.py::test_sp_training_matches_single_device",               # 27s
    "test_rl.py::test_update_recompute_matches_collection_with_mid_window_resets",  # 26s
    "test_rl.py::test_update_metrics_and_finiteness",                   # 24s
    "test_rl.py::test_train_logs_eval_events",                          # 23s
    "test_training.py::test_dp_matches_single_device",                  # 22s
    "test_tp.py::test_tp_training_matches_single_device",               # 22s
    "test_rl.py::test_grouped_collect_update_end_to_end",               # 20s
    "test_training.py::test_loss_decreases_on_fixed_batch",             # 19s
    "test_ring_cache.py::test_ring_equals_linear_over_long_run",        # 16s
    # second batch: ~5-6s solo each, all with overlapping coverage elsewhere
    # in the quick tier or in the slow tier
    "test_rl.py::test_evaluate_report_and_shaped_reward",
    "test_sp.py::test_sp_idm_labeling_matches_unsharded",
    "test_rollout_runner.py::test_pipelined_rollout_runner",
    "test_pp.py::test_pipelined_grads_match_sequential",
    "test_pp.py::test_pipelined_forward_matches_sequential",
    "test_agent.py::test_mesh_sharded_int8_serving_matches_single_device",
    "test_training.py::test_evaluate_held_out_nll",
    "test_torch_parity.py::test_attention_layer_parity",
    "test_kv_cache.py::test_two_chunks_equal_one_long_history",
    "test_streaming_idm.py::test_predict_actions_batched_shards_over_mesh",
    "test_img_statistics.py::test_full_policy_with_stats_and_torch_roundtrip",
    "test_idm_training.py::test_idm_train_dp_mesh_equals_single_device",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        base_key = f"{fname}::{item.name.split('[')[0]}"   # all parametrizations
        param_key = f"{fname}::{item.name}"                # one parametrization
        if fname in _SLOW_FILES or base_key in _SLOW_TESTS or param_key in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
