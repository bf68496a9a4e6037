"""Orbax checkpointing: full train state, async-capable, resume-exact.

The reference checkpoints weights only, per epoch, via Keras
`ModelCheckpoint` (`/root/reference/src/training_utils.py:32-45`); optimizer
slots and the step counter are lost on resume (SURVEY.md §5).  Here the
whole `TrainState` (step, params, Adam moments) round-trips, so a preempted
run resumes bit-exactly.  Checkpoints are sharding-aware: on restore, each
array lands directly on its mesh shards without a host gather.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    """Thin wrapper over `orbax.checkpoint.CheckpointManager`.

    Keeps the reference's per-epoch cadence (`save(step)` called by the
    trainer at epoch ends) but with full-state fidelity and retention.
    """

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        if "://" in directory:
            # remote checkpoint bucket (the reference's CKPT_BUCKET_NAME leg,
            # `main.py:24-27`, `training_utils.py:38-45`): Orbax/tensorstore
            # speak gs:// natively — abspath/makedirs would mangle the URL
            pass
        else:
            directory = os.path.abspath(directory)
            os.makedirs(directory, exist_ok=True)
        self._manager = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: TrainState, wait: bool = False) -> None:
        self._manager.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._manager.latest_step()

    def restore(self, state_like: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure/shardings of `state_like` (an
        abstract or concretely-sharded TrainState)."""
        if step is None:
            step = self._manager.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        abstract = jax.tree.map(_as_abstract, state_like)
        return self._manager.restore(step, args=ocp.args.StandardRestore(abstract))

    def wait_until_finished(self) -> None:
        self._manager.wait_until_finished()

    def close(self) -> None:
        self._manager.close()


def _as_abstract(x: Any):
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        sharding = getattr(x, "sharding", None)
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
    return x
