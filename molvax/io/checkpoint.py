"""Checkpoint/resume via orbax (sharding-aware, async-capable).

Reference parity: the reference calls ``torch.save(model.state_dict(), p)``
each epoch and resumes with ``load_state_dict`` (SURVEY.md 2.12, 5.4). Here
the whole TrainState pytree - params, optimizer state, step counter, base
PRNG key - is checkpointed, so resume restores the exact training
trajectory (including the KL-annealing position and per-step keys).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def make_manager(directory: str, keep: int = 3) -> ocp.CheckpointManager:
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    return ocp.CheckpointManager(directory, options=options)


def _to_savable(state):
    # PRNG keys (typed) must be saved as raw uint32 key data.
    def conv(x):
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key
        ):
            return jax.random.key_data(x)
        return x

    return jax.tree.map(conv, state)


def save(manager: ocp.CheckpointManager, step: int, state) -> None:
    manager.save(step, args=ocp.args.StandardSave(_to_savable(state)))


def restore_latest(manager: ocp.CheckpointManager, abstract_state) -> Optional[Any]:
    """Restore the newest checkpoint shaped like ``abstract_state``
    (a concrete template state is fine). Returns None if no checkpoint."""
    step = manager.latest_step()
    if step is None:
        return None
    template = _to_savable(abstract_state)
    restored = manager.restore(step, args=ocp.args.StandardRestore(template))
    # Re-wrap raw key data into typed PRNG keys at the treedef positions
    # where the original state had them.
    return _rewrap_keys(abstract_state, restored)


def _rewrap_keys(abstract_state, restored):
    leaves_a, treedef = jax.tree.flatten(abstract_state)
    leaves_r = treedef.flatten_up_to(restored)
    out = []
    for a, r in zip(leaves_a, leaves_r):
        if isinstance(a, jax.Array) and jax.dtypes.issubdtype(
            a.dtype, jax.dtypes.prng_key
        ):
            out.append(jax.random.wrap_key_data(np.asarray(r)))
        else:
            out.append(r)
    return jax.tree.unflatten(treedef, out)
