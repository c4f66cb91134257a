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


def test_eda_produces_all_notebook_plot_families(tmp_path):
    """eda.py at notebook-02 parity: the five figure families (class
    distribution, box stats, spatial heatmap, per-class area boxplots,
    annotated samples) are all written from a real parquet + images."""
    import numpy as np
    import pandas as pd
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(3)
    rows = []
    for i in range(6):
        name = f"img_{i}.jpg"
        Image.fromarray((rng.rand(80, 100, 3) * 255).astype(np.uint8)).save(
            img_dir / name)
        k = rng.randint(1, 4)
        rows.append({
            "file_name": name, "height": 80, "width": 100,
            "bbox": [[float(rng.randint(0, 50)), float(rng.randint(0, 40)),
                      float(rng.randint(10, 40)), float(rng.randint(10, 30))]
                     for _ in range(k)],
            "category_id": [int(rng.randint(0, 3)) for _ in range(k)],
            "name": [["cat", "dog", "bus"][int(rng.randint(0, 3))]
                     for _ in range(k)],
            "supercategory": [["animal", "animal", "vehicle"][
                int(rng.randint(0, 3))] for _ in range(k)],
        })
    pq_dir = tmp_path / "parquet"
    pq_dir.mkdir()
    pd.DataFrame(rows).to_parquet(pq_dir / "part-0.parquet")

    plots = tmp_path / "plots"
    r = _run([os.path.join("examples", "eda.py"),
              "--parquet", str(pq_dir), "--images", str(img_dir),
              "--save_plots", str(plots)], timeout=300)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    assert "images: 6" in r.stdout
    assert "area split @640" in r.stdout
    for fam in ("class_distribution", "box_stats", "spatial_heatmap",
                "area_by_class", "samples"):
        f = plots / f"{fam}.png"
        assert f.exists() and f.stat().st_size > 1000, fam


def test_train_smoke_synthetic_cpu():
    # n-preset train-step CPU compile is ~2-4 min cold; the persistent
    # cache (shared with the rest of the suite) makes reruns seconds
    r = _run([os.path.join("examples", "train_smoke.py"), "--synthetic",
              "--steps", "2", "--batch_size", "2", "--input_size", "64"],
             timeout=540)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    out = r.stdout.lower()
    assert "total=" in out and "steps" in out, r.stdout[-1000:]
