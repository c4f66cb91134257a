"""Metric-decode parity against the LIVE reference.

``eval/decode.py::decode_predictions`` documents itself as the equivalent of
the reference's ``decode_predictions`` (``src/training/train_model.py:
14-142``) including quirk #5 (no NMS before the metrics). This test imports
the reference function itself (torchvision/wandb stubbed — only their module
objects are touched at import) and asserts the decoded detection SETS agree
on random predictions, across the below-threshold, under-top_k, and
over-top_k regimes. Row order differs by design (the reference keeps anchor
order when <= top_k survive; the fixed-shape jit path always emits
score-descending), so rows are canonicalized by sorting before comparison.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = os.environ.get("REFERENCE_ROOT", "/root/reference")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src", "training")),
    reason="reference checkout unavailable")

NC = 7
REG_MAX = 16
SHAPES = [(8, 8), (4, 4), (2, 2)]
STRIDES = (8, 16, 32)


@pytest.fixture(scope="module")
def ref_decode():
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    sys.modules.setdefault("wandb", types.ModuleType("wandb"))
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.training.train_model import decode_predictions
    return decode_predictions


def _canon(rows: np.ndarray) -> np.ndarray:
    """Order-independent canonical form: lexicographic row sort."""
    if rows.size == 0:
        return rows.reshape(0, 5)
    return rows[np.lexsort(rows.T[::-1])]


@pytest.mark.parametrize("conf,top_k", [
    (0.25, 100),   # typical: a few survivors, far under top_k
    (0.01, 20),    # over-top_k regime: the top-k gate actually bites
    (0.999, 100),  # empty regime
])
def test_decode_matches_reference(ref_decode, conf, top_k):
    import jax.numpy as jnp

    from custom_yolo_tpu.eval.decode import (decode_predictions,
                                             decoded_to_lists)
    from custom_yolo_tpu.ops.anchors import make_anchors

    rng = np.random.RandomState(0)
    m = sum(h * w for h, w in SHAPES)
    preds = rng.uniform(-4, 2, (3, m, 4 * REG_MAX + NC)).astype(np.float32)
    anchors, strides = make_anchors(SHAPES, STRIDES, offset=0.5)

    with torch.no_grad():
        ref_out = ref_decode(
            torch.from_numpy(preds.transpose(0, 2, 1)),
            torch.from_numpy(np.asarray(anchors).T.copy()),
            torch.from_numpy(np.asarray(strides).T.copy()),
            conf_threshold=conf, top_k=top_k, num_classes=NC)

    ours = decoded_to_lists(decode_predictions(
        jnp.asarray(preds), anchors, strides, conf_threshold=conf,
        top_k=top_k))

    assert len(ours) == len(ref_out)
    for mine, theirs in zip(ours, ref_out):
        theirs = theirs.numpy()
        assert mine.shape == theirs.shape
        np.testing.assert_allclose(_canon(mine), _canon(theirs),
                                   rtol=1e-4, atol=1e-4)
