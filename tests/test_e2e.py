"""End-to-end smoke test: synthetic tiny-COCO → ETL → loader → Trainer
(1 epoch) → checkpoint → resume. The formalization of the reference's
notebook-03 manual smoke run (SURVEY §4/§6)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_project(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("proj")
    ann_dir = root / "annotations"
    img_dir = root / "images"
    ann_dir.mkdir()
    img_dir.mkdir()

    rng = np.random.RandomState(1)
    images, annotations = [], []
    for i in range(8):
        w, h = 96, 96
        name = f"img_{i:03d}.jpg"
        Image.fromarray(
            (rng.rand(h, w, 3) * 255).astype(np.uint8)).save(img_dir / name)
        images.append({"id": i + 1, "file_name": name,
                       "height": h, "width": w})
        for _ in range(2):
            bw, bh = float(rng.randint(15, 35)), float(rng.randint(15, 35))
            x, y = float(rng.randint(0, 60)), float(rng.randint(0, 60))
            annotations.append({
                "id": len(annotations) + 1, "image_id": i + 1,
                "category_id": int(rng.choice([1, 2, 3])),
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
                "segmentation": [[x, y, x + bw, y, x + bw, y + bh]]})
    categories = [{"id": 1, "name": "a", "supercategory": "s"},
                  {"id": 2, "name": "b", "supercategory": "s"},
                  {"id": 3, "name": "c", "supercategory": "s"}]
    with open(ann_dir / "instances_val2017.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": categories}, f)

    from custom_yolo_tpu.data.preprocess import DataPreprocess
    DataPreprocess.create_parquet_data(
        annotations_dir=str(ann_dir), output_dir=str(root / "parquet"),
        output_folder="val", file_names=["instances_val2017.json"],
        keys=["images", "annotations", "categories"],
        columns=[["id", "file_name", "height", "width"],
                 ["id", "image_id", "category_id", "bbox", "area",
                  "iscrowd", "segmentation"],
                 ["id", "name", "supercategory"]],
        chunk_sizes=[100, 100, 100], is_test=False)
    return root


def test_train_one_epoch_and_resume(tiny_project, tmp_path):
    import jax
    import jax.numpy as jnp

    from custom_yolo_tpu.config import Config
    from custom_yolo_tpu.core.dtypes import DTypePolicy
    from custom_yolo_tpu.data.dataset import DetectionDataset
    from custom_yolo_tpu.data.loader import DataLoader
    from custom_yolo_tpu.models import YoloModel
    from custom_yolo_tpu.train.trainer import Trainer
    from custom_yolo_tpu.utils.checkpoint import CheckpointManager

    cfg = Config.from_dict({
        "project": {"num_classes": 3, "seed": 0},
        "model": {"num_classes": 3, "input_size": [64, 64],
                  "config": {"csp": [False, True],
                             "depth": [1, 1, 1, 1, 1, 1],
                             "width": [3, 8, 16, 32, 64, 64]}},
        "training": {"batch_size": 4, "epochs": 1, "log_interval": 1,
                     "learning_rate": 1e-3,
                     "sharding": {"mode": "single",
                                  "precision": "float32"}},
    })

    policy = DTypePolicy(compute_dtype=jnp.float32)
    model = YoloModel(width=tuple(cfg.model.width),
                      depth=tuple(cfg.model.depth),
                      csp=tuple(cfg.model.csp), num_classes=3,
                      policy=policy)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)

    ds = DetectionDataset(str(tiny_project / "parquet" / "val"),
                          str(tiny_project / "images"),
                          input_size=(64, 64), max_gt=8)
    train_loader = DataLoader(ds, 4, shuffle=True, drop_last=True,
                              num_workers=2, seed=0)
    val_loader = DataLoader(ds, 4, shuffle=False, drop_last=False,
                            num_workers=2, seed=0)

    ckpt = CheckpointManager(str(tmp_path / "ckpts"))
    trainer = Trainer(cfg, model, variables, checkpoint_manager=ckpt)
    result = trainer.fit(train_loader, val_loader)

    assert len(result["history"]) == 1
    rec = result["history"][0]
    assert np.isfinite(rec["train/total_loss"])
    assert np.isfinite(rec["val/total_loss"])
    assert "val/precision" in rec
    assert int(trainer.state.epoch) == 1

    # resume: restore into a fresh trainer, epochs=2 runs exactly 1 more
    ckpt.wait()
    assert ckpt.latest_epoch() == 0
    trainer2 = Trainer(cfg, model, variables, checkpoint_manager=None)
    restored = ckpt.restore(jax.device_get(trainer2.state))
    trainer2.state = restored
    assert int(trainer2.state.epoch) == 1
    assert int(trainer2.state.step) == int(trainer.state.step)
    result2 = trainer2.fit(train_loader, val_loader, epochs=2)
    assert len(result2["history"]) == 1  # only epoch 1 ran
    ckpt.close()


def test_native_loader_matches_pil(tiny_project):
    from custom_yolo_tpu.data.dataset import DetectionDataset
    from custom_yolo_tpu.data.loader import DataLoader
    from custom_yolo_tpu.runtime import native_available

    if not native_available():
        pytest.skip("native runtime unavailable")

    ds = DetectionDataset(str(tiny_project / "parquet" / "val"),
                          str(tiny_project / "images"),
                          input_size=(64, 64), max_gt=8)
    nat = DataLoader(ds, 4, shuffle=False, drop_last=False, num_workers=2,
                     use_native=True)
    pil = DataLoader(ds, 4, shuffle=False, drop_last=False, num_workers=2,
                     use_native=False)
    for bn, bp in zip(nat, pil):
        assert bn["image"].shape == bp["image"].shape
        diff = np.abs(bn["image"].astype(int) - bp["image"].astype(int))
        assert diff.max() <= 1  # decoder rounding parity
        np.testing.assert_allclose(bn["gt_boxes"], bp["gt_boxes"])
        np.testing.assert_array_equal(bn["image_id"], bp["image_id"])


def test_checkpoint_restores_into_abstract_template(tmp_path):
    """Restore must accept a jax.eval_shape template (no concrete arrays,
    no shardings). Abstract leaves used to make orbax fall back to the
    sharding recorded in the checkpoint — which names the SAVING devices
    and breaks cross-topology restores (TPU-trained -> CPU eval host);
    CheckpointManager now injects the local default device (r3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from custom_yolo_tpu.train.train_state import TrainState
    from custom_yolo_tpu.utils.checkpoint import CheckpointManager

    tx = optax.adamw(1e-3)
    variables = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
                 "batch_stats": {"m": jnp.ones((3,))}}
    state = TrainState.create(variables, tx, jax.random.key(0))
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(3, state)
    mgr.wait()

    template = jax.eval_shape(
        lambda: TrainState.create(
            {"params": {"w": jnp.zeros((2, 3))},
             "batch_stats": {"m": jnp.zeros((3,))}},
            tx, jax.random.key(0)))
    restored = mgr.restore(template)
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.arange(6.0).reshape(2, 3))
    # restored arrays must be concrete and locally addressable
    assert restored.params["w"].sharding.device_set <= set(jax.local_devices())
    mgr.close()


def test_checkpoint_roundtrips_ema(tmp_path):
    """EMA params (training-quality extension) are part of the train state
    and must survive save→restore — including through an abstract
    template, the scripts/evaluate.py restore path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from custom_yolo_tpu.train.train_state import TrainState
    from custom_yolo_tpu.utils.checkpoint import CheckpointManager

    tx = optax.adamw(1e-3)
    variables = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}}
    state = TrainState.create(variables, tx, jax.random.key(0), ema=True)
    state = state.replace(ema_params={"w": jnp.full((2, 3), 7.0)})
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(0, state)
    mgr.wait()

    template = jax.eval_shape(
        lambda: TrainState.create({"params": {"w": jnp.zeros((2, 3))}},
                                  tx, jax.random.key(0), ema=True))
    restored = mgr.restore(template)
    np.testing.assert_array_equal(np.asarray(restored.ema_params["w"]),
                                  np.full((2, 3), 7.0))
    np.testing.assert_array_equal(
        np.asarray(restored.eval_variables["params"]["w"]),
        np.full((2, 3), 7.0))
    mgr.close()
