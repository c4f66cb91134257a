"""Orbax checkpointing — save/restore the FULL train state.

Replaces the reference's ``torch.save`` checkpoints
(``src/training/utils_train.py:38-56`` + resume in
``scripts/distributed_training.py:146-160``) and fixes its gaps (SURVEY §5):
scheduler (plateau) state, PRNG key, and step counter are checkpointed;
restore is sharding-aware (the reference saved FSDP shards per-rank with no
consolidation — quirk #8). A ``model_config.json`` sidecar records the
architecture/precision/mode exactly like the reference
(distributed_training.py:55-62)."""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

CKPT_RE = re.compile(r"model_epoch_(\d+)$")


def save_sidecar(checkpoint_dir: str, config: Dict[str, Any]) -> None:
    os.makedirs(checkpoint_dir, exist_ok=True)
    with open(os.path.join(checkpoint_dir, "model_config.json"), "w") as f:
        json.dump(config, f, indent=2)


def load_sidecar(checkpoint_dir: str) -> Optional[Dict[str, Any]]:
    path = os.path.join(checkpoint_dir, "model_config.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


class CheckpointManager:
    """Async orbax manager writing ``model_epoch_{e}`` steps (the
    reference's file-name convention, utils_train.py:49)."""

    def __init__(self, checkpoint_dir: str,
                 max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(checkpoint_dir)
        os.makedirs(self.directory, exist_ok=True)
        self._manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                step_prefix="model_epoch",
                create=True,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, epoch: int, state: Any,
             metrics: Optional[Dict[str, float]] = None) -> None:
        self._manager.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                **({"metrics": ocp.args.JsonSave(metrics)}
                   if metrics is not None else {}),
            ),
        )

    def restore(self, state_template: Any, epoch: Optional[int] = None) -> Any:
        """Restore into the template's structure/shardings; latest epoch if
        unspecified.

        The template may be abstract (``jax.eval_shape`` output). Abstract
        leaves carry no sharding, and orbax then falls back to the sharding
        recorded *in the checkpoint* — which names the devices it was saved
        on and breaks cross-topology restores (e.g. evaluating a TPU-trained
        checkpoint on a CPU host). Inject the local default device for any
        leaf without a concrete sharding so restores land on whatever this
        host has.
        """
        step = epoch if epoch is not None else self._manager.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint found under {self.directory}")

        import jax
        from jax.sharding import SingleDeviceSharding
        device = jax.local_devices()[0]

        def _concretize(leaf):
            if (isinstance(leaf, jax.ShapeDtypeStruct)
                    and getattr(leaf, "sharding", None) is None):
                return jax.ShapeDtypeStruct(
                    leaf.shape, leaf.dtype,
                    sharding=SingleDeviceSharding(device))
            return leaf

        state_template = jax.tree.map(_concretize, state_template)
        restored = self._manager.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template)),
        )
        return restored["state"]

    def latest_epoch(self) -> Optional[int]:
        return self._manager.latest_step()

    def wait(self) -> None:
        self._manager.wait_until_finished()

    def close(self) -> None:
        self._manager.close()
