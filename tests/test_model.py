"""Model composition tests: shapes, param parity, fusion, jit-equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from custom_yolo_tpu.models import YoloModel, fuse_params
from custom_yolo_tpu.ops.anchors import num_anchors


def test_output_contract(tiny_model):
    model, variables = tiny_model
    x = jnp.zeros((2, 64, 64, 3))
    preds, anchors, strides = model.apply(variables, x, train=False)
    m = num_anchors((64, 64))
    assert preds.shape == (2, m, 7 + 64)
    assert anchors.shape == (m, 2)
    assert strides.shape == (m, 1)


def test_param_count_matches_reference_formula(tiny_model):
    """The torch reference 'n' preset has 2,808,816 params (measured by
    instantiating /root/reference/src/model/model_builder.py); ours must be
    exactly 16 fewer — the reference's frozen DFL arange conv
    (model_blocks.py:273-275) is a pure function here."""
    model = YoloModel(width=(3, 16, 32, 64, 128, 256),
                      depth=(1, 1, 1, 1, 1, 1), csp=(False, True),
                      num_classes=172)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    n = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert n == 2_808_816 - 16


def test_train_mode_updates_batch_stats(tiny_model):
    model, variables = tiny_model
    x = jnp.ones((2, 64, 64, 3))
    _, mutated = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(mutated["batch_stats"])
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(old, new))
    assert changed


def test_jit_equivalence(tiny_model):
    model, variables = tiny_model
    x = jnp.asarray(np.random.RandomState(1).randn(1, 64, 64, 3),
                    jnp.float32)
    eager, _, _ = model.apply(variables, x, train=False)
    jitted, _, _ = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, x)
    np.testing.assert_allclose(np.asarray(eager, np.float32),
                               np.asarray(jitted, np.float32),
                               atol=1e-2, rtol=1e-2)  # bf16 tolerance


def test_fuse_params_equivalence(tiny_model):
    """Folded conv+BN must reproduce the unfused eval forward (the reference
    fuse-equivalence property, model_builder.py:52-58)."""
    model, variables = tiny_model
    # perturb batch_stats away from init (mean 0 var 1) to make it a real test
    stats = jax.tree.map(lambda v: v + 0.05, variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}
    x = jnp.asarray(np.random.RandomState(2).randn(1, 64, 64, 3),
                    jnp.float32)
    ref, _, _ = model.apply(variables, x, train=False)
    fused_vars = fuse_params(variables)
    fused_model = model.clone(fused=True)
    got, _, _ = fused_model.apply(fused_vars, x, train=False)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=5e-2, rtol=5e-2)  # bf16 compute


def test_cls_bias_prior_init(tiny_model):
    model, variables = tiny_model
    bias = variables["params"]["head"]["cls0_out"]["bias"]
    expected = float(np.log(0.01 / 0.99))
    np.testing.assert_allclose(np.asarray(bias), expected, atol=1e-5)


def test_remat_equivalence(tiny_model):
    """remat=True must not change forward values (it only changes what the
    backward rematerializes) and grads must still flow."""
    model, variables = tiny_model
    remat_model = model.clone(remat=True)
    x = jnp.asarray(np.random.RandomState(3).randn(1, 64, 64, 3),
                    jnp.float32)
    a, _, _ = model.apply(variables, x, train=False)
    b, _, _ = remat_model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32), atol=1e-2)

    def loss(v):
        (preds, _, _), _ = remat_model.apply(v, x, train=True,
                                             mutable=["batch_stats"])
        return jnp.sum(preds.astype(jnp.float32) ** 2)

    g = jax.grad(loss)({"params": variables["params"],
                        "batch_stats": variables["batch_stats"]})
    norms = [float(jnp.linalg.norm(t)) for t in jax.tree.leaves(g["params"])]
    assert all(np.isfinite(norms))
    assert sum(norms) > 0


def test_detector_serve_batch():
    """The jitted end-to-end serving path (forward→decode→NMS in one
    program) must agree with the composable inference path."""
    from custom_yolo_tpu.models import Detector
    det = Detector([3, 8, 16, 32, 64, 64], [1, 1, 1, 1, 1, 1],
                   [False, True], num_classes=7, precision="float32",
                   input_size=(64, 64))
    det.init(seed=0)
    imgs = jnp.asarray(np.random.RandomState(5).rand(2, 64, 64, 3),
                       jnp.float32)
    r = det.serve(imgs, conf_thres=0.01, max_det=16)
    assert r.boxes.shape == (2, 16, 4)
    assert r.valid.shape == (2, 16)
    # second call hits the cache (same compiled program)
    r2 = det.serve(imgs, conf_thres=0.01, max_det=16)
    np.testing.assert_allclose(np.asarray(r.scores), np.asarray(r2.scores))


def test_detector_save_load_weights(tmp_path):
    from custom_yolo_tpu.models import Detector
    det = Detector([3, 8, 16, 32, 64, 64], [1, 1, 1, 1, 1, 1],
                   [False, True], num_classes=7, precision="float32",
                   input_size=(64, 64))
    det.init(seed=0)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    ref, _, _ = det(x)

    path = str(tmp_path / "weights")
    det.save_weights(path)

    det2 = Detector([3, 8, 16, 32, 64, 64], [1, 1, 1, 1, 1, 1],
                    [False, True], num_classes=7, precision="float32",
                    input_size=(64, 64))
    det2.init(seed=99)  # different init, then overwritten by load
    det2.load_weights(path)
    got, _, _ = det2(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_s2d_stem_equivalence(tiny_model):
    """space-to-depth stem (s2d_stem=True + convert_stem_variables) must
    reproduce the standard stem's forward exactly (the transform is a
    re-expression of the same linear map, backbone.stem_kernel_to_s2d)."""
    from custom_yolo_tpu.models.detector import convert_stem_variables

    model, variables = tiny_model
    x = jnp.asarray(np.random.RandomState(3).randn(2, 64, 64, 3),
                    jnp.float32)
    ref, _, _ = model.apply(variables, x, train=False)
    s2d_model = model.clone(s2d_stem=True)
    s2d_vars = convert_stem_variables(variables)
    got, _, _ = s2d_model.apply(s2d_vars, x, train=False)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=5e-2, rtol=5e-2)  # bf16 resum tolerance


def test_s2d_stem_equivalence_fp32_exact(tiny_model):
    """In fp32 the s2d stem matches to float-roundoff."""
    from custom_yolo_tpu.core.dtypes import resolve_policy
    from custom_yolo_tpu.models.detector import convert_stem_variables

    model, variables = tiny_model
    f32 = model.clone(policy=resolve_policy("float32"))
    x = jnp.asarray(np.random.RandomState(4).randn(1, 64, 64, 3),
                    jnp.float32)
    ref, _, _ = f32.apply(variables, x, train=False)
    got, _, _ = f32.clone(s2d_stem=True).apply(
        convert_stem_variables(variables), x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_s2d_stem_composes_with_fuse(tiny_model):
    """fuse → s2d-convert must equal the plain fused forward."""
    from custom_yolo_tpu.models.detector import convert_stem_variables

    model, variables = tiny_model
    fused_vars = fuse_params(variables)
    fused = model.clone(fused=True)
    x = jnp.asarray(np.random.RandomState(5).randn(1, 64, 64, 3),
                    jnp.float32)
    ref, _, _ = fused.apply(fused_vars, x, train=False)
    got, _, _ = fused.clone(s2d_stem=True).apply(
        convert_stem_variables(fused_vars), x, train=False)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=5e-2, rtol=5e-2)


WIDE = dict(width=(3, 16, 32, 64, 256, 256), depth=(1, 1, 1, 1, 1, 1),
            csp=(False, True))  # p4/p5/h6 C3Ks at half=64 = MERGE_MIN_HALF


def _wide_model():
    """Smallest model whose C3Ks cross the MERGE_MIN_HALF gate."""
    from custom_yolo_tpu.core.dtypes import resolve_policy

    model = YoloModel(num_classes=7, policy=resolve_policy("float32"),
                      **WIDE)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    return model, variables


def test_c3k_merge_equivalence_fp32_exact():
    """merged=True + merge_c3k_params must be bit-identical math: conv1 and
    conv2 of every C3K read the same input and own disjoint output channels,
    so the horizontal concat is the same set of contractions."""
    from custom_yolo_tpu.models.detector import merge_c3k_params

    model, variables = _wide_model()
    fused_vars = fuse_params(variables)
    f32 = model.clone(fused=True)
    x = jnp.asarray(np.random.RandomState(6).randn(2, 64, 64, 3),
                    jnp.float32)
    ref, _, _ = f32.apply(fused_vars, x, train=False)
    merged_vars = {"params": merge_c3k_params(fused_vars["params"])}
    got, _, _ = f32.clone(merged=True).apply(merged_vars, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_c3k_merge_respects_min_half_gate():
    """C3Ks below MERGE_MIN_HALF keep separate convs (measured
    pessimization on v5e at half=48); wide C3Ks merge; C3K2's same-named
    convs (NOT same-input) survive untouched."""
    from custom_yolo_tpu.models.detector import merge_c3k_params

    model, variables = _wide_model()
    fused = fuse_params(variables)["params"]
    merged = merge_c3k_params(fused)
    for stage in ("p4_csp", "p5_csp"):          # half = 64: merged
        node = merged["net"][stage]["m0"]
        assert "conv12" in node and "conv1" not in node
        half = fused["net"][stage]["m0"]["conv1"]["conv"]["kernel"].shape[-1]
        assert node["conv12"]["conv"]["kernel"].shape[-1] == 2 * half
        assert "conv1" in merged["net"][stage]  # C3K2 own convs stay
        assert "conv2" in merged["net"][stage]
    assert "conv12" in merged["fpn"]["h6"]["m0"]

    # below the gate: tiny preset C3Ks (half=16) must NOT merge
    tiny = YoloModel(width=(3, 8, 16, 32, 64, 64), depth=(1,) * 6,
                     csp=(False, True), num_classes=7)
    tvars = tiny.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                      train=False)
    tmerged = merge_c3k_params(fuse_params(tvars)["params"])
    assert "conv1" in tmerged["net"]["p4_csp"]["m0"]
    assert "conv12" not in tmerged["net"]["p4_csp"]["m0"]


def test_c3k_merge_composes_with_quantize():
    """fuse → merge → int8-quantize runs and stays close to fused fp32."""
    from custom_yolo_tpu.models.detector import merge_c3k_params
    from custom_yolo_tpu.ops.quant import quantize_fused_params

    model, variables = _wide_model()
    fused_vars = fuse_params(variables)
    x = jnp.asarray(np.random.RandomState(7).rand(1, 64, 64, 3), jnp.float32)
    ref, _, _ = model.clone(fused=True).apply(fused_vars, x, train=False)
    qmerged = quantize_fused_params(merge_c3k_params(fused_vars["params"]))
    got, _, _ = model.clone(fused=True, merged=True, quantized=True).apply(
        {"params": qmerged}, x, train=False)
    r = np.asarray(ref, np.float32).ravel()
    g = np.asarray(got, np.float32).ravel()
    assert np.corrcoef(r, g)[0, 1] > 0.99


def test_detector_optimize_for_tpu_full_stack():
    """Detector.fuse().optimize_for_tpu(): s2d stem + C3K merge, same
    detections as the plain fused path."""
    from custom_yolo_tpu.models import Detector

    det = Detector(WIDE["width"], WIDE["depth"], WIDE["csp"],
                   num_classes=7, precision="float32", input_size=(64, 64))
    det.init(seed=0)
    x = jnp.asarray(np.random.RandomState(8).rand(2, 64, 64, 3), jnp.float32)
    ref = det.serve(x, conf_thres=0.0, max_det=8)
    det.fuse().optimize_for_tpu()
    assert det.module.merged and det.module.s2d_stem
    got = det.serve(x, conf_thres=0.0, max_det=8)
    np.testing.assert_allclose(np.asarray(got.boxes),
                               np.asarray(ref.boxes), atol=1e-3, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(got.classes),
                                  np.asarray(ref.classes))


def test_all_presets_build_shapes():
    """Every preset (incl. the opt-in x-tpu) composes into a valid model:
    abstract init via eval_shape (no FLOPs) + output contract at 64²."""
    from custom_yolo_tpu.models.presets import PRESETS
    from custom_yolo_tpu.ops.anchors import num_anchors

    m = num_anchors((64, 64))
    for name, p in PRESETS.items():
        model = YoloModel(width=tuple(p["width"]), depth=tuple(p["depth"]),
                          csp=tuple(p["csp"]), num_classes=17)
        x = jnp.zeros((1, 64, 64, 3))
        variables = jax.eval_shape(
            lambda xx: model.init(jax.random.key(0), xx, train=False), x)
        preds, anchors, strides = jax.eval_shape(
            lambda v, xx: model.apply(v, xx, train=False), variables, x)
        assert preds.shape == (1, m, 17 + 64), name
        assert anchors.shape == (m, 2) and strides.shape == (m, 1), name


def test_save_load_roundtrip_transformed(tmp_path):
    """save_weights/load_weights must round-trip TRANSFORMED trees
    (fuse + optimize_for_tpu + quantize) via the transforms.json sidecar —
    restoring against an untransformed template is a tree mismatch."""
    from custom_yolo_tpu.models import Detector

    def build():
        return Detector(WIDE["width"], WIDE["depth"], WIDE["csp"],
                        num_classes=7, precision="float32",
                        input_size=(64, 64))

    x = jnp.asarray(np.random.RandomState(9).rand(1, 64, 64, 3), jnp.float32)
    det = build()
    det.init(seed=0)
    det.fuse().optimize_for_tpu()
    ref, _, _ = det(x)
    path = str(tmp_path / "opt_ckpt")
    det.save_weights(path)

    det2 = build()
    det2.load_weights(path)
    assert det2.module.merged and det2.module.s2d_stem and det2._fused
    got, _, _ = det2(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    # quantized round-trip too
    det.quantize()
    qref, _, _ = det(x)
    qpath = str(tmp_path / "q_ckpt")
    det.save_weights(qpath)
    det3 = build()
    det3.load_weights(qpath)
    assert det3.module.quantized
    qgot, _, _ = det3(x)
    np.testing.assert_allclose(np.asarray(qgot), np.asarray(qref), atol=1e-6)
