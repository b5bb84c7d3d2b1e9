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
