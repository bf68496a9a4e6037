"""Device-mesh construction for SPMD training/inference.

The reference scales with `tf.distribute.TPUStrategy` — data parallelism
only, implicit gradient all-reduce (`/root/reference/src/main.py:139-154`,
SURVEY.md §2.5).  The TPU-native replacement is a `jax.sharding.Mesh` over
ICI with named axes:

  * ``data``  — batch (data-parallel) axis; gradients are reduced over it by
    XLA-inserted collectives when the batch is sharded with
    ``P("data", ...)``.
  * ``model`` — tensor-parallel axis; attention heads and FFN hidden units
    are sharded over it (see `partition.py`), XLA inserting all-reduces
    after ``out_proj`` / ``output_dense``.

Multi-host: pass ``jax.devices()`` (the default) — under
`jax.distributed.initialize` that already spans all processes, and the mesh
is laid out so ``model`` maps to the minor (fastest, intra-host ICI) axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ("data", "model") mesh.

    ``data=-1`` means "all remaining devices".  The model axis is minor so
    tensor-parallel collectives ride the fastest ICI links.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if model < 1 or n % model != 0:
        raise ValueError(f"model axis {model} does not divide device count {n}")
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_map_batch(fn, mesh: Mesh, num_args: int):
    """Wrap a batch-parallel function for per-shard execution on `mesh`.

    The first argument is sharded over the data axis (leading dim); the
    remaining `num_args - 1` arguments are replicated.  Used to partition
    Pallas kernels — opaque custom calls that GSPMD would otherwise gather
    onto every device — whose math is independent per batch row (the conv
    front-end, the positional conv).  Along the model axis the inputs are
    replicated, so each model shard recomputes the same thing XLA's
    replicated lowering would.
    """
    in_specs = (P(DATA_AXIS),) + (P(),) * (num_args - 1)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=P(DATA_AXIS),
        check_vma=False,
    )
