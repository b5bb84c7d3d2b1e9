import glob
import os

import jax.numpy as jnp
import numpy as np

from vpt_tpu.utils.metrics import MetricsLogger
from vpt_tpu.utils.profiling import activation_stats, profile_trace


def test_activation_stats_naming():
    tree = {"block0": {"attn": jnp.ones((2, 3)), "mlp": jnp.zeros((4,))}}
    stats = activation_stats(tree)
    assert set(stats) == {
        "activation_mean/block0/attn", "activation_std/block0/attn",
        "activation_mean/block0/mlp", "activation_std/block0/mlp",
    }
    assert float(stats["activation_mean/block0/attn"]) == 1.0
    assert float(stats["activation_std/block0/mlp"]) == 0.0


def test_profile_trace_writes_files(tmp_path):
    logdir = str(tmp_path / "trace")
    with profile_trace(logdir):
        x = jnp.ones((128, 128))
        (x @ x).block_until_ready()
    files = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert files, "profiler produced no output files"


def test_metrics_logger_json_lines(tmp_path):
    import io
    import json

    buf = io.StringIO()
    path = str(tmp_path / "metrics.jsonl")
    m = MetricsLogger(path=path, stream=buf)
    m.log(step=1, loss=2.5)
    m.log(step=2, loss=2.25, grad_norm=0.5)
    m.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 1 and lines[1]["grad_norm"] == 0.5
    assert json.loads(buf.getvalue().splitlines()[0])["loss"] == 2.5
