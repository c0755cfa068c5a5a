"""The examples/ walkthroughs must keep running — they are living docs.

Each example is executed as a real subprocess exactly the way its module
docstring tells a user to run it (CPU platform, repo root on sys.path).
These are end-to-end smoke tests: exit code 0 plus the final banner line is
the contract; numeric quality is covered by the unit/parity suites.

The reference repo's only example was its ``__main__`` blocks — one of
which was broken at the published commit (``visualization.py:44-48`` calls
``generate_metric_plots`` with the wrong arity).  Executing our examples in
CI is the guard against shipping that failure mode.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def _run_example(name: str, extra_env: dict | None = None, timeout: int = 900):
    env = dict(os.environ)
    env["GOALNET_PLATFORM"] = "cpu"
    env.update(extra_env or {})
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", name)],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"{name} failed ({proc.returncode}):\n--- stdout\n{proc.stdout}"
        f"\n--- stderr\n{proc.stderr}"
    )
    return proc.stdout


def test_train_and_summarize_example():
    out = _run_example("train_and_summarize.py")
    assert "summary:" in out and "artifacts in" in out


def test_serve_and_spot_example():
    out = _run_example("serve_and_spot.py")
    assert "dynamic batching" in out
    assert "average-mAP" in out


def test_live_follow_spotting_example():
    out = _run_example("live_follow_spotting.py")
    assert "segment 0 finalized" in out
    assert "live follow spotting: done" in out


def test_multihost_example_single_process():
    # With no GOALNET_COORDINATOR the example runs as a 1-process "cluster"
    # over the virtual CPU devices — same code path, no coordination service.
    out = _run_example(
        "multihost_train.py",
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=4"},
    )
    assert "process 0: done" in out
