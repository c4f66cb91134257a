"""Config parsing tests: the reference's config.yaml shape must map onto the
typed Config, including legacy fsdp/ddp blocks and the nested model preset."""

import pytest

from custom_yolo_tpu.config import Config


REFERENCE_SHAPED = {
    "project": {"name": "x", "seed": 42, "num_classes": 172,
                "device": "cuda", "distributed": True,
                "mixed_precision": True, "output_dir": "experiments",
                "log_dir": "./l", "profile_dir": "./p",
                "description": "d"},
    "data": {"root_dir": "./dataset", "num_workers": 8,
             "pin_memory": True, "prefetch_factor": 2, "is_test": True},
    "model": {"input_size": [640, 640], "num_classes": 172,
              "config": {"csp": [True, True],
                         "depth": [2, 2, 2, 2, 2, 2],
                         "width": [3, 96, 192, 384, 768, 768]}},
    "training": {
        "is_test": True, "batch_size": 4, "epochs": 1,
        "learning_rate": 1e-4, "weight_decay": 1e-4,
        "optimizer": "adamw", "scheduler": "reduce_on_plateau",
        "grad_clip": 1.0, "early_stopping_patience": 5,
        "learning_rate_patience": 3, "learning_rate_factor": 0.5,
        # legacy reference blocks (config.yaml:73-89)
        "fsdp": {"sharding_strategy": "FULL_SHARD",
                 "auto_wrap_policy_min_params": 10000000,
                 "precision": "bfloat16"},
        "fsdp2": {"precision": "bfloat16"},
        "ddp": {"find_unused_parameters": False, "precision": "float32"},
        "weights": {"cls_loss": 1.0, "bbox_loss": 1.5, "mask_loss": 0.5},
    },
    "wandb": {"enable": True, "project_name": "hpc", "entity": "e",
              "run_name": "r", "log_frequency": 1, "mode": "online"},
    "checkpoint": {"save_interval": 1, "resume_training": False,
                   "best_model_metric": "val/loss",
                   "best_model_mode": "min", "checkpoint_dir": "./c"},
    "logging": {"console_log": True, "file_log": True,
                "log_level": "INFO"},
}


def test_reference_yaml_shape_parses():
    cfg = Config.from_dict(REFERENCE_SHAPED)
    assert cfg.model.width == [3, 96, 192, 384, 768, 768]
    assert cfg.model.csp == [True, True]
    assert cfg.project.seed == 42
    assert cfg.training.batch_size == 4
    # legacy loss weights map onto lambdas
    assert cfg.training.lambda_cls == 1.0
    assert cfg.training.lambda_box == 1.5
    # legacy ddp precision becomes the sharding precision default
    assert cfg.training.sharding.precision == "float32"
    assert cfg.checkpoint.best_model_mode == "min"
    assert cfg.logging.log_level == "INFO"


def test_new_sharding_block_wins():
    raw = dict(REFERENCE_SHAPED)
    raw["training"] = dict(REFERENCE_SHAPED["training"])
    raw["training"]["sharding"] = {"mode": "fsdp", "precision": "bfloat16"}
    cfg = Config.from_dict(raw)
    assert cfg.training.sharding.mode == "fsdp"
    assert cfg.training.sharding.precision == "bfloat16"


def test_validation_errors():
    with pytest.raises(ValueError):
        Config.from_dict({"model": {"config": {"width": [3, 4]}}})
    with pytest.raises(ValueError):
        Config.from_dict({"training": {"sharding": {"mode": "pipeline"}}})
    with pytest.raises(ValueError):
        Config.from_dict({"training": {"assigner": "atss"}})


def test_roundtrip_save_load(tmp_path):
    cfg = Config.from_dict(REFERENCE_SHAPED)
    path = tmp_path / "cfg.yaml"
    cfg.save(str(path))
    cfg2 = Config.from_yaml(str(path))
    assert cfg2.model.width == cfg.model.width
    assert cfg2.training.sharding.precision == \
        cfg.training.sharding.precision


def test_defaults_complete():
    cfg = Config.from_dict({})
    assert cfg.model.num_classes == 172
    assert cfg.training.sharding.mode == "dp"
    assert cfg.data.max_gt_boxes == 128


def test_project_switches_act():
    """project.distributed / project.mixed_precision override the detailed
    sharding knobs (they were decorative in the reference)."""
    raw = {"project": {"distributed": False, "mixed_precision": False},
           "training": {"sharding": {"mode": "dp",
                                     "precision": "bfloat16"}}}
    cfg = Config.from_dict(raw)
    assert cfg.training.sharding.mode == "single"
    assert cfg.training.sharding.precision == "float32"


def test_best_model_mode_validated():
    with pytest.raises(ValueError):
        Config.from_dict({"checkpoint": {"best_model_mode": "median"}})
