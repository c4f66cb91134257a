"""CI coverage for the example scripts (VERDICT r2 weak #7: examples were
untested — bench-rot under a cold cache applies to every entry point).

Each example is (a) import/argparse-checked via ``--help`` in a subprocess
(catches syntax errors, broken imports, renamed CLI flags without paying
model-compile time), and (b) the cheapest one — ``train_smoke
--synthetic`` — is run end-to-end on CPU at toy shapes, which drives the
jitted train step through the exact code path the example documents."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = ["eda.py", "inference_demo.py", "serve_folder.py",
            "train_smoke.py"]


def _run(args, timeout=240):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


@pytest.mark.parametrize("script", EXAMPLES)
def test_example_help_runs(script):
    r = _run([os.path.join("examples", script), "--help"], timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "usage" in (r.stdout + r.stderr).lower()


def test_train_smoke_synthetic_cpu():
    # n-preset train-step CPU compile is ~2-4 min cold; the persistent
    # cache (shared with the rest of the suite) makes reruns seconds
    r = _run([os.path.join("examples", "train_smoke.py"), "--synthetic",
              "--steps", "2", "--batch_size", "2", "--input_size", "64"],
             timeout=540)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    out = r.stdout.lower()
    assert "total=" in out and "steps" in out, r.stdout[-1000:]
