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

    def all_steps(self) -> list:
        return sorted(self._manager.all_steps())

    def restore_raw(self, step: Optional[int] = None):
        """Restore a checkpoint WITHOUT a state template: returns the saved
        pytree as plain host arrays (a nested dict for the `TrainState`
        struct).  Lets offline tools (checkpoint averaging, inspection)
        read training checkpoints without reconstructing the optimizer."""
        if step is None:
            step = self._manager.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        return self._manager.restore(step)

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


def average_checkpoint_params(
    directory: str,
    steps: Optional[list] = None,
    last_n: Optional[int] = None,
):
    """Arithmetic mean of the `params` subtree over several training
    checkpoints — the classic tail-averaging WER booster (Polyak-style;
    the reference keeps per-epoch weight files, `training_utils.py:38-45`,
    but ships no way to combine them).

    `steps`: explicit checkpoint steps to average; `last_n`: take the
    newest N instead (default: ALL retained checkpoints).  Returns
    `(mean_params, steps_used)`; float leaves are averaged in float64 then
    cast back to their saved dtype, non-float leaves must agree across
    checkpoints and pass through unchanged.
    """
    import numpy as np

    mgr = CheckpointManager(directory)
    try:
        available = mgr.all_steps()
        if not available:
            raise FileNotFoundError(f"no checkpoints under {directory}")
        if steps is not None:
            missing = sorted(set(steps) - set(available))
            if missing:
                raise ValueError(
                    f"steps {missing} not in checkpoint dir {directory} "
                    f"(available: {available})"
                )
            use = sorted(steps)
        elif last_n is not None:
            if last_n <= 0:
                raise ValueError("last_n must be positive")
            use = available[-last_n:]
        else:
            use = available

        def leaf_sum(acc, new):
            if np.issubdtype(np.asarray(new).dtype, np.floating):
                return acc + np.asarray(new, np.float64)
            if not np.array_equal(acc, new):
                raise ValueError(
                    "non-float param leaf differs across checkpoints"
                )
            return acc

        acc = None
        dtypes = None
        for step in use:
            params = mgr.restore_raw(step)["params"]
            if acc is None:
                dtypes = jax.tree.map(lambda x: np.asarray(x).dtype, params)
                acc = jax.tree.map(
                    lambda x: (
                        np.asarray(x, np.float64)
                        if np.issubdtype(np.asarray(x).dtype, np.floating)
                        else np.asarray(x)
                    ),
                    params,
                )
            else:
                acc = jax.tree.map(leaf_sum, acc, params)
        mean = jax.tree.map(
            lambda s, dt: (
                np.asarray(s / len(use), dt)
                if np.issubdtype(dt, np.floating)
                else s
            ),
            acc,
            dtypes,
        )
        return mean, use
    finally:
        mgr.close()
