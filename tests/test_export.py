"""Serialized serving artifacts (custom_yolo_tpu/export.py).

Exports the fused serving graph (forward + decode + NMS, weights baked in)
with jax.export, restores it from disk in a separate object, and asserts
bit-identical results vs the live ``Detector.serve`` path — for the bf16
fused model and the static-int8 quantized model. Also pins the manifest
contract (platform guard, shape guard).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def detector():
    from custom_yolo_tpu.models import Detector

    det = Detector((3, 8, 16, 32, 64, 64), (1, 1, 1, 1, 1, 1),
                   (False, True), num_classes=5, precision="float32",
                   input_size=(64, 64))
    det.init(seed=0)
    det.fuse()
    return det


@pytest.fixture(scope="module")
def images(rng_module=None):
    rng = np.random.RandomState(0)
    return rng.randn(2, 64, 64, 3).astype(np.float32)


def test_export_round_trip_matches_serve(tmp_path, detector, images):
    import jax.numpy as jnp

    from custom_yolo_tpu.export import export_serving, load_exported

    path = export_serving(detector, str(tmp_path / "art"), batch_size=2,
                          conf_thres=0.001, top_k=64, max_det=20)
    server = load_exported(path)
    got = server(images)
    want = detector.serve(jnp.asarray(images), conf_thres=0.001, top_k=64,
                          max_det=20)
    np.testing.assert_array_equal(np.asarray(got.boxes),
                                  np.asarray(want.boxes))
    np.testing.assert_array_equal(np.asarray(got.scores),
                                  np.asarray(want.scores))
    np.testing.assert_array_equal(np.asarray(got.classes),
                                  np.asarray(want.classes))
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(want.valid))
    assert server.manifest["num_classes"] == 5
    assert server.manifest["transforms"]["fused"] is True


def test_export_quantized_static(tmp_path, detector, images):
    import copy

    import jax.numpy as jnp

    from custom_yolo_tpu.export import export_serving, load_exported
    from custom_yolo_tpu.models import Detector

    det = Detector((3, 8, 16, 32, 64, 64), (1, 1, 1, 1, 1, 1),
                   (False, True), num_classes=5, precision="float32",
                   input_size=(64, 64))
    det.init(seed=0)
    det.quantize(skip=())
    det.calibrate([images])
    path = export_serving(det, str(tmp_path / "art_q"), batch_size=2,
                          conf_thres=0.001, top_k=64, max_det=20)
    server = load_exported(path)
    got = server(images)
    want = det.serve(jnp.asarray(images), conf_thres=0.001, top_k=64,
                     max_det=20)
    np.testing.assert_array_equal(np.asarray(got.boxes),
                                  np.asarray(want.boxes))
    assert server.manifest["transforms"]["quantized"] is True
    assert server.manifest["transforms"]["static_quant"] is True


def test_input_shape_guard(tmp_path, detector, images):
    from custom_yolo_tpu.export import export_serving, load_exported

    path = export_serving(detector, str(tmp_path / "art2"), batch_size=2)
    server = load_exported(path)
    with pytest.raises(ValueError, match="expected input"):
        server(images[:1])


def test_platform_guard(tmp_path, detector):
    import json
    import os

    from custom_yolo_tpu.export import export_serving, load_exported

    path = export_serving(detector, str(tmp_path / "art3"), batch_size=1)
    manifest = json.load(open(os.path.join(path, "manifest.json")))
    manifest["platforms"] = ["tpu_v9_imaginary"]
    json.dump(manifest, open(os.path.join(path, "manifest.json"), "w"))
    with pytest.raises(RuntimeError, match="re-export on the target"):
        load_exported(path)
