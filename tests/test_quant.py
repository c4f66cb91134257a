"""int8 quantized-serving tests (ops/quant.py + ConvBN quantized mode).

The reference has no quantized path; this is a TPU-native serving
capability (v5e int8 MXU = 2× bf16). CPU tests exercise the same XLA ops
(int8 conv with int32 accumulation works on the CPU backend too).
"""

import jax
import jax.numpy as jnp
import numpy as np

from custom_yolo_tpu.models import fuse_params
from custom_yolo_tpu.ops.quant import (
    int8_conv, quantize_act_int8, quantize_fused_params,
    quantize_kernel_int8, stochastic_quantize_int8)


def test_quantize_kernel_roundtrip():
    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(3, 3, 16, 32).astype(np.float32))
    q, s = quantize_kernel_int8(k)
    assert q.dtype == jnp.int8 and s.shape == (32,)
    deq = q.astype(jnp.float32) * s
    # symmetric round-to-nearest: |err| <= scale/2 per element
    err = np.abs(np.asarray(deq - k))
    assert (err <= np.asarray(s)[None, None, None, :] / 2 + 1e-7).all()


def test_quantize_act_symmetric():
    x = jnp.asarray([[-2.0, 0.0, 1.0, 2.0]])
    q, s = quantize_act_int8(x)
    np.testing.assert_allclose(np.asarray(s), 2.0 / 127.0, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(q)[0], [-127, 0, 64, 127])


def test_stochastic_quantize_unbiased():
    """E[q·scale] ≈ x across seeds (stochastic rounding is unbiased where
    round-to-nearest has a systematic per-element bias)."""
    rng = np.random.RandomState(1)
    k = jnp.asarray((rng.rand(1, 1, 4, 8) * 0.1).astype(np.float32))
    acc = 0.0
    n = 64
    for seed in range(n):
        q, s = stochastic_quantize_int8(k, seed=seed)
        acc = acc + np.asarray(q.astype(jnp.float32) * s)
    mean = acc / n
    scale = np.asarray(jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0)
    # mean error well under the half-ULP worst case of deterministic round
    assert np.abs(mean - np.asarray(k)).max() < scale.max() * 0.45


def test_int8_conv_matches_float_conv():
    """Dynamic int8 conv ≈ float conv within quantization noise."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(16).astype(np.float32) * 0.01)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = jax.nn.silu(ref + b)
    qk, s = quantize_kernel_int8(k)
    got = int8_conv(x, qk, s, b, strides=(1, 1),
                    padding=((1, 1), (1, 1)))
    denom = np.abs(np.asarray(ref)).max()
    rel = np.abs(np.asarray(got, np.float32) - np.asarray(ref)).max() / denom
    assert rel < 0.05, rel


def test_quantized_model_forward(tiny_model):
    """fuse → quantize_fused_params → quantized forward: runs, is finite,
    and stays close to the fused bf16 forward (head logit projections are
    untouched so box/cls decode semantics survive)."""
    model, variables = tiny_model
    fused_vars = fuse_params(variables)
    fused = model.clone(fused=True)
    x = jnp.asarray(np.random.RandomState(5).rand(1, 64, 64, 3),
                    jnp.float32)
    ref, _, _ = fused.apply(fused_vars, x, train=False)

    qparams = quantize_fused_params(fused_vars["params"])
    # every ConvBN kernel is int8 + has a scale; finals untouched
    def check(tree, path=""):
        for key, val in tree.items():
            if key == "conv" and "scale" in val:
                assert val["kernel"].dtype == jnp.int8
                assert val["scale"].dtype == jnp.float32
            elif key.endswith("_out"):
                assert val["kernel"].dtype != jnp.int8
            elif isinstance(val, dict):
                check(val, path + "/" + key)
    check(qparams)

    qmodel = model.clone(fused=True, quantized=True)
    got, _, _ = qmodel.apply({"params": qparams}, x, train=False)
    assert np.isfinite(np.asarray(got, np.float32)).all()
    r = np.asarray(ref, np.float32).ravel()
    g = np.asarray(got, np.float32).ravel()
    # int8 backbone noise compounds; demand strong agreement, not equality
    corr = np.corrcoef(r, g)[0, 1]
    assert corr > 0.99, corr


def test_int8_conv_static_matches_dynamic():
    """With in_scale set to the dynamic scale, the static conv is
    bit-identical to the dynamic one (same quantized operands)."""
    from custom_yolo_tpu.ops.quant import int8_conv_static

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 8, 16).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(16).astype(np.float32) * 0.01)
    qk, s = quantize_kernel_int8(k)
    _, ascale = quantize_act_int8(x)
    dyn = int8_conv(x, qk, s, b)
    stat = int8_conv_static(x, qk, s, b, ascale)
    np.testing.assert_array_equal(np.asarray(dyn), np.asarray(stat))


def test_detector_calibrate_static_quant(tiny_model):
    """quantize() → calibrate(): static scales are baked, the serving
    graph matches the dynamic one bit-for-bit on the calibration data and
    stays accurate on unseen data; the sidecar restores the static tree."""
    import os
    import tempfile

    from custom_yolo_tpu.models import Detector
    from custom_yolo_tpu.ops.quant import has_static_scales

    def build():
        return Detector((3, 8, 16, 32, 64, 64), (1, 1, 1, 1, 1, 1),
                        (False, True), num_classes=7, input_size=(64, 64),
                        precision="float32")

    det = build()
    det.init(seed=0)
    rng = np.random.RandomState(7)
    cal = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    unseen = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)

    det.fuse()
    ref_unseen, _, _ = det._apply_eval(det.variables, unseen)
    det.quantize()
    dyn_cal, _, _ = det._apply_eval(det.variables, cal)
    det.calibrate([cal])
    assert has_static_scales(det.variables["params"])

    # bit-identical on the calibration batch (identical scales)
    stat_cal, _, _ = det._apply_eval(det.variables, cal)
    np.testing.assert_array_equal(np.asarray(dyn_cal), np.asarray(stat_cal))

    # accurate on unseen data (same distribution ⇒ scales transfer)
    stat_unseen, _, _ = det._apply_eval(det.variables, unseen)
    r = np.asarray(ref_unseen, np.float32).ravel()
    g = np.asarray(stat_unseen, np.float32).ravel()
    assert np.corrcoef(r, g)[0, 1] > 0.99

    # double-calibration is rejected; sidecar roundtrip restores exactly
    try:
        det.calibrate([cal])
        assert False, "expected calibrate() to refuse a second pass"
    except AssertionError:
        pass
    path = os.path.join(tempfile.mkdtemp(), "ckpt")
    det.save_weights(path)
    det2 = build().load_weights(path)
    got, _, _ = det2._apply_eval(det2.variables, unseen)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(stat_unseen))


def test_static_quant_composes_with_c3k_merge(tiny_model):
    """quantize → calibrate → C3K merge: the merged conv12 carries the
    shared scalar in_scale (concat would fail on a 0-d leaf) and the
    merged static graph matches the unmerged static graph exactly."""
    from custom_yolo_tpu.models import Detector
    from custom_yolo_tpu.models.detector import merge_c3k_params

    det = Detector((3, 8, 16, 32, 128, 256), (1, 1, 1, 1, 1, 1),
                   (True, True), num_classes=7, input_size=(64, 64),
                   precision="float32")
    det.init(seed=0)
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    det.quantize()
    det.calibrate([x])
    ref, _, _ = det._apply_eval(det.variables, x)
    merged_params = merge_c3k_params(det.variables["params"])
    merged = det.module.clone(merged=True)
    got, _, _ = merged.apply({"params": merged_params}, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_detector_quantize_api(tiny_model):
    """Detector.quantize(): end-to-end serve() on the int8 path."""
    from custom_yolo_tpu.models import Detector

    det = Detector((3, 8, 16, 32, 64, 64), (1, 1, 1, 1, 1, 1),
                   (False, True), num_classes=7, input_size=(64, 64),
                   precision="float32")
    det.init(seed=0)
    det.quantize()
    assert det.module.quantized and det.module.fused
    x = jnp.asarray(np.random.RandomState(6).rand(2, 64, 64, 3),
                    jnp.float32)
    res = det.serve(x, conf_thres=0.0, max_det=10)
    assert res.boxes.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(res.scores)).all()
