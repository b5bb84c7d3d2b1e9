"""CLI interface smoke: the three entry points must parse reference-style
arguments (argparse compatibility, SURVEY.md §2 #1/#3/#21)."""

import subprocess
import sys

import pytest

CLIS = ["run_agent.py", "run_inverse_dynamics_model.py", "behavioural_cloning.py",
        "rl_fine_tune.py"]


@pytest.mark.parametrize("cli", CLIS)
def test_help_parses(cli):
    out = subprocess.run(
        [sys.executable, cli, "--help"], capture_output=True, text=True, timeout=120
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert "--weights" in out.stdout or "--in-weights" in out.stdout


def test_reference_flag_names_present():
    out = subprocess.run(
        [sys.executable, "run_inverse_dynamics_model.py", "--help"],
        capture_output=True, text=True, timeout=120,
    )
    for flag in ("--weights", "--model", "--video-path", "--jsonl-path", "--n-frames", "--n-batches"):
        assert flag in out.stdout, flag
    out = subprocess.run(
        [sys.executable, "behavioural_cloning.py", "--help"],
        capture_output=True, text=True, timeout=120,
    )
    for flag in ("--data-dir", "--in-model", "--in-weights", "--out-weights"):
        assert flag in out.stdout, flag
