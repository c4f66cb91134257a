"""Device-mesh construction.

TPU-native replacement for the reference's process-group plumbing
(``src/training/distributed_setup.py:6-26`` — torchrun env vars +
``init_process_group(nccl|gloo)``). In JAX the comm backend is XLA itself:
we build a ``jax.sharding.Mesh`` over the slice and let GSPMD insert
collectives over ICI. One mesh subsumes the reference's DDP / FSDP1 / FSDP2
trio (``utils_train.py:58-192``):

* ``dp``   — all devices on the ``data`` axis (DDP analogue)
* ``fsdp`` — all devices on the ``fsdp`` axis; batch *and* params sharded
             over it (ZeRO-3 analogue)
* 2-D meshes (``data`` × ``fsdp``) for multi-slice hybrid sharding.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"


def data_axis() -> str:
    return DATA_AXIS


def fsdp_axis() -> str:
    return FSDP_AXIS


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape. axis sizes of 1 are kept so PartitionSpecs stay
    valid regardless of mode."""
    data: int = 1
    fsdp: int = 1

    @classmethod
    def for_mode(cls, mode: str, num_devices: Optional[int] = None) -> "MeshSpec":
        n = num_devices if num_devices is not None else jax.device_count()
        if mode == "single":
            return cls(data=1, fsdp=1)
        if mode == "dp":
            return cls(data=n, fsdp=1)
        if mode == "fsdp":
            return cls(data=1, fsdp=n)
        raise ValueError(f"unknown sharding mode {mode!r}")


def create_mesh(spec: MeshSpec,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    n = spec.data * spec.fsdp
    if n > len(devices):
        raise ValueError(
            f"mesh {spec} needs {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(spec.data, spec.fsdp)
    return Mesh(grid, (DATA_AXIS, FSDP_AXIS))


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (replaces torchrun rendezvous,
    ``slurm/distributed_training_gpu.sbatch:35-67``). No-op when single
    process or when args are absent."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
