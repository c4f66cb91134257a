"""CI smoke for the production serving CLI (``scripts/serve.py``): drives
directory listing → native JPEG decode (+ PIL fallback for a PNG) →
padded fixed-shape batches → pipelined ``Detector.serve`` dispatch →
original-pixel box rescale → JSON output, on CPU at toy shapes."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("serve_imgs")
    rng = np.random.RandomState(0)
    for i in range(5):
        arr = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.jpg", quality=90)
    Image.fromarray((rng.rand(50, 70, 3) * 255).astype(np.uint8)).save(
        d / "extra.png")
    return d


def test_serve_cli_end_to_end(image_dir, tmp_path):
    out = tmp_path / "det.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    r = subprocess.run(
        [sys.executable, "scripts/serve.py", "--images", str(image_dir),
         "--preset", "n", "--num_classes", "3", "--input_size", "64",
         "--batch_size", "4", "--inflight", "2", "--fast_decode",
         "--conf", "0.0", "--output", str(out)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"serve.py failed:\n{r.stdout}\n{r.stderr}"

    results = json.loads(out.read_text())
    # 6 input images (5 jpg + 1 png via the PIL fallback), batch 4 → one
    # padded tail batch whose pad rows must NOT appear in the output
    assert len(results) == 6
    names = {r["image"] for r in results}
    assert "extra.png" in names and "img_0.jpg" in names
    for rec in results:
        w, h = rec["width"], rec["height"]
        assert (w, h) in {(128, 96), (70, 50)}
        for det in rec["detections"]:
            x1, y1, x2, y2, conf, cls = det
            # boxes are in ORIGINAL image pixels, clipped to the canvas
            assert 0 <= x1 <= x2 <= w, det
            assert 0 <= y1 <= y2 <= h, det
            assert 0.0 <= conf <= 1.0 and 0 <= int(cls) < 3
    # conf=0.0 on random init: NMS emits candidates for every image
    assert any(rec["detections"] for rec in results)
