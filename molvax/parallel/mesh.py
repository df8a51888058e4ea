"""Device mesh + sharding rules (GSPMD data parallel over ICI).

Reference parity: the reference is single-process single-device - no
DataParallel, no torch.distributed, no collectives (SURVEY.md section 2
parallelism inventory). Scaling out is a rebuild upgrade mandated by the
driver (BASELINE.json:5,10).

TPU-native design (SURVEY.md 5.8): a ('data', 'model') mesh; parameters and
optimizer state replicated (P()), batches sharded along 'data'. The gradient
all-reduce is the compiler-inserted psum over ICI - no user-level collective
code anywhere. The 'model' axis is reserved so tensor parallelism can be
added without re-plumbing callers (SURVEY.md section 2: TP "design mesh so a
model axis can be added later"); at this model scale it stays size 1.

Multi-chip hardware is not attached during development: the same code runs on
a single chip (trivial 1-device mesh), on 8 fake CPU devices
(--xla_force_host_platform_device_count=8, tests/distributed), and on a real
v5e-8 unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    cfg: Optional[MeshConfig] = None, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if cfg is None:
        data = len(devices)
        model = 1
    else:
        data, model = cfg.data_axis, cfg.model_axis
    want = data * model
    if want > len(devices):
        raise ValueError(
            f"mesh {data}x{model} needs {want} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:want]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis split over 'data'; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(chunk, B, ...) stacks: batch (axis 1) split over 'data'."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_batch(mesh: Mesh, *arrays):
    sh = batch_sharding(mesh)
    out = tuple(None if a is None else jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))
