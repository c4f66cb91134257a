"""Numerical parity against the LIVE reference network.

Every other parity test in this suite validates against transcriptions
(numpy re-implementations of the reference math). This one closes the loop:
it instantiates the reference's actual PyTorch modules
(``/root/reference/src/model``), moves the weights across with
``utils.torch_port``, and asserts the two frameworks produce the same
numbers — unfused and conv+BN-fused — plus a strict state-dict round trip.

Requires torch (CPU) and the reference checkout; skipped cleanly otherwise.
The reference's ``model_utils`` imports torchvision at module scope for its
NMS (which we never call) — a stub module satisfies the import.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = os.environ.get("REFERENCE_ROOT", "/root/reference")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src", "model")),
    reason="reference checkout unavailable")

# tiny-but-structurally-complete config: covers r=4 and r=2 C3K2 stages,
# C3K chains (csp=[True,True]), depth-2 res_m sequences, a 2-head PSA
# (width[5]=256 -> reference heads = 128//128... see below), SPPF, and the
# full decoupled head at 3 levels.
WIDTH = (3, 8, 16, 32, 64, 256)
DEPTH = (2, 1, 1, 1, 2, 1)
CSP = (True, True)
NC = 7
HW = 64


@pytest.fixture(scope="module")
def ref_model():
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.model.backbone import Backbone as RefBackbone
    from src.model.head import Head as RefHead
    from src.model.neck import Neck as RefNeck
    from torch import nn

    class RefModel(nn.Module):
        """Reference ``Model`` composition (model_builder.py:13-50) without
        the torchvision-importing inference plumbing; strides pinned to the
        values the dummy forward computes (8/16/32)."""

        def __init__(self):
            super().__init__()
            self.net = RefBackbone(list(WIDTH), list(DEPTH), list(CSP))
            self.fpn = RefNeck(list(WIDTH), list(DEPTH), list(CSP))
            self.head = RefHead(NC, (WIDTH[3], WIDTH[4], WIDTH[5]))
            self.head.stride = torch.tensor([8.0, 16.0, 32.0])

        def forward(self, x):
            return self.head(list(self.fpn(self.net(x))))

    torch.manual_seed(0)
    model = RefModel()
    # populate BN running stats with non-trivial values the way real
    # checkpoints have them: a couple of train-mode passes
    model.train()
    with torch.no_grad():
        for _ in range(2):
            model(torch.randn(2, 3, HW, HW))
    model.eval()
    return model


@pytest.fixture(scope="module")
def detector(ref_model):
    from custom_yolo_tpu.models import Detector
    from custom_yolo_tpu.utils.torch_port import from_torch_state_dict

    det = Detector(WIDTH, DEPTH, CSP, num_classes=NC, precision="float32",
                   input_size=(HW, HW))
    det.init()
    det.load_variables(from_torch_state_dict(ref_model.state_dict(),
                                             det.variables))
    return det


@pytest.fixture(scope="module")
def image():
    rng = np.random.RandomState(7)
    return rng.randn(2, HW, HW, 3).astype(np.float32)


def _torch_forward(ref_model, image):
    with torch.no_grad():
        preds, anchors, strides = ref_model(
            torch.from_numpy(image.transpose(0, 3, 1, 2)))
    return preds.numpy(), anchors.numpy(), strides.numpy()


def test_forward_parity_unfused(ref_model, detector, image):
    import jax.numpy as jnp

    preds_t, anchors_t, strides_t = _torch_forward(ref_model, image)
    preds, anchors, strides = detector(jnp.asarray(image))
    preds = np.asarray(preds).transpose(0, 2, 1)  # anchor-major -> (N,no,M)
    # anchors/strides: exact (integer grid math on both sides)
    np.testing.assert_array_equal(np.asarray(anchors).T, anchors_t)
    np.testing.assert_array_equal(np.asarray(strides).T, strides_t)
    assert preds.shape == preds_t.shape
    scale = np.abs(preds_t).max()
    assert np.abs(preds - preds_t).max() < 1e-3 * max(scale, 1.0)


def test_forward_parity_fused(ref_model, detector, image):
    import copy

    import jax.numpy as jnp
    from src.model.model_blocks import Conv
    from src.utils.model_utils import fuse_conv

    fused_ref = copy.deepcopy(ref_model)
    for m in fused_ref.modules():  # reference Model.fuse, model_builder:52-58
        if type(m) is Conv and hasattr(m, "norm"):
            m.conv = fuse_conv(m.conv, m.norm)
            m.forward = m.fuse_forward
            delattr(m, "norm")
    with torch.no_grad():
        preds_t, _, _ = fused_ref(torch.from_numpy(image.transpose(0, 3, 1,
                                                                   2)))
    preds_t = preds_t.numpy()

    detector.fuse()
    preds, _, _ = detector(jnp.asarray(image))
    preds = np.asarray(preds).transpose(0, 2, 1)
    scale = np.abs(preds_t).max()
    assert np.abs(preds - preds_t).max() < 1e-3 * max(scale, 1.0)


def test_state_dict_round_trip(ref_model, detector):
    """Export back to torch layout and load with strict=True — torch itself
    verifies key-completeness; values must round-trip bit-exactly."""
    import copy

    from custom_yolo_tpu.utils.torch_port import to_torch_state_dict

    # detector may have been fused by the previous test — rebuild unfused
    from custom_yolo_tpu.models import Detector
    from custom_yolo_tpu.utils.torch_port import from_torch_state_dict

    det = Detector(WIDTH, DEPTH, CSP, num_classes=NC, precision="float32",
                   input_size=(HW, HW))
    det.init()
    variables = from_torch_state_dict(ref_model.state_dict(), det.variables)
    exported = to_torch_state_dict(variables)

    target = copy.deepcopy(ref_model)
    target.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in exported.items()},
        strict=True)
    for key, original in ref_model.state_dict().items():
        if key.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(
            target.state_dict()[key].numpy(), original.numpy(),
            err_msg=key)


def test_import_cli(tmp_path, ref_model):
    """scripts/import_torch.py end-to-end: torch file -> orbax checkpoint
    that Detector.load_weights restores to exactly the converted tree."""
    import subprocess

    import jax

    from custom_yolo_tpu.models import Detector
    from custom_yolo_tpu.utils.torch_port import from_torch_state_dict

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = tmp_path / "model_epoch_1"
    torch.save({"model_state": ref_model.state_dict()}, str(ckpt))
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(
        "model:\n"
        f"  input_size: [{HW}, {HW}]\n"
        f"  num_classes: {NC}\n"
        "  config: {csp: [true, true], depth: [2, 1, 1, 1, 2, 1], "
        "width: [3, 8, 16, 32, 64, 256]}\n")
    out_dir = tmp_path / "imported"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join("scripts", "import_torch.py"),
         "--torch_checkpoint", str(ckpt), "--output", str(out_dir),
         "--config", str(cfg)],
        cwd=repo, env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]

    det = Detector(WIDTH, DEPTH, CSP, num_classes=NC, precision="float32",
                   input_size=(HW, HW))
    det.load_weights(str(out_dir))
    expect_det = Detector(WIDTH, DEPTH, CSP, num_classes=NC,
                          precision="float32", input_size=(HW, HW))
    expect_det.init()
    expected = from_torch_state_dict(ref_model.state_dict(),
                                     expect_det.variables)
    jax.tree_util.tree_map(np.testing.assert_array_equal, det.variables,
                           expected)


def test_mismatched_config_rejected(ref_model):
    from custom_yolo_tpu.models import Detector
    from custom_yolo_tpu.utils.torch_port import from_torch_state_dict

    det = Detector(WIDTH, DEPTH, CSP, num_classes=NC + 1,
                   precision="float32", input_size=(HW, HW))
    det.init()
    with pytest.raises(ValueError, match="shape mismatch"):
        from_torch_state_dict(ref_model.state_dict(), det.variables)


def test_checkpoint_file_wrapper(tmp_path, ref_model):
    """The trainer's {"model_state": ...} wrapper (utils_train.py:50-56)
    loads through load_torch_checkpoint / import_torch_weights."""
    import jax

    from custom_yolo_tpu.models import Detector
    from custom_yolo_tpu.utils.torch_port import (from_torch_state_dict,
                                                  import_torch_weights)

    path = tmp_path / "model_epoch_3"
    torch.save({"epoch": 3, "model_state": ref_model.state_dict(),
                "val_loss": 1.0}, str(path))
    det = Detector(WIDTH, DEPTH, CSP, num_classes=NC, precision="float32",
                   input_size=(HW, HW))
    import_torch_weights(det, str(path))

    expect_det = Detector(WIDTH, DEPTH, CSP, num_classes=NC,
                          precision="float32", input_size=(HW, HW))
    expect_det.init()
    expected = from_torch_state_dict(ref_model.state_dict(),
                                     expect_det.variables)
    jax.tree_util.tree_map(np.testing.assert_array_equal, det.variables,
                           expected)
