"""True multi-process distributed test: two OS processes rendezvous via
jax.distributed (the torchrun-replacement path, core/mesh.py) on the CPU
backend and all-reduce metrics through parallel.collectives — the
cross-process layer the virtual-device tests cannot cover."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from custom_yolo_tpu.core.mesh import initialize_distributed
from custom_yolo_tpu.parallel.collectives import reduce_metrics, reduce_value

coord, pid = sys.argv[1], int(sys.argv[2])
initialize_distributed(coord, 2, pid)
assert jax.process_count() == 2, jax.process_count()

# scalar all-reduce (the reference's reduce_value, distributed_setup.py:28-63)
avg = reduce_value(float(pid + 1), average=True)   # (1 + 2) / 2
total = reduce_value(float(pid + 1), average=False)
metrics = reduce_metrics({"loss": float(10 * (pid + 1))})
print(f"RESULT {pid} {float(avg):.4f} {float(total):.4f} "
      f"{metrics['loss']:.4f}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_reduce(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # plain 1-device-per-process CPU
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        for pid in (0, 1)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=150)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    for pid, out in enumerate(outs):
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        _, got_pid, avg, total, loss = line.split()
        assert int(got_pid) == pid
        assert abs(float(avg) - 1.5) < 1e-6      # mean(1, 2)
        assert abs(float(total) - 3.0) < 1e-6    # sum(1, 2)
        assert abs(float(loss) - 15.0) < 1e-6    # mean(10, 20)
