"""Multi-host SPMD bootstrap.

The reference connects to a TPU pod through
`TPUClusterResolver(TPU_NAME)` + `experimental_connect_to_cluster` +
`initialize_tpu_system` (`/root/reference/src/main.py:139-148`) and then
relies on TPUStrategy.  The JAX equivalent is `jax.distributed.initialize`
(per-host processes, ICI/DCN discovered automatically on TPU VMs) plus
host-local data feeding via `jax.make_array_from_process_local_data`.

Usage (one process per host, e.g. under `gcloud compute tpus tpu-vm ssh
--worker=all`):

    from gsoc_wav2vec2_tpu.parallel import multihost, make_mesh
    multihost.initialize()                 # no-op on single-process runs
    mesh = make_mesh(model=1)              # spans all hosts' devices
    batch = multihost.host_local_batch_to_global(local_np_batch, mesh)
"""

from __future__ import annotations

import os
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise the JAX distributed runtime (idempotent, single-process
    safe).

    On Cloud TPU VMs all arguments are discovered from the metadata server;
    elsewhere pass them explicitly or via JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID (honoured by jax itself).
    """
    if num_processes in (None, 1) and coordinator_address is None and (
        "JAX_COORDINATOR_ADDRESS" not in os.environ
        and "COORDINATOR_ADDRESS" not in os.environ
        and not os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",")
    ):
        # single host: nothing to initialise
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialised
        if "already" not in str(e).lower():
            raise


def sync_run_id(run_id: str, max_len: int = 64) -> str:
    """Every process adopts process 0's run id (checkpoint dirs must agree
    across hosts — the reference got this from host-0's wandb id,
    `main.py:272-274`).  Single-process: identity."""
    if jax.process_count() == 1:
        return run_id
    import numpy as np
    from jax.experimental import multihost_utils

    buf = np.zeros(max_len, np.uint8)
    raw = run_id.encode()[:max_len]
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    synced = multihost_utils.broadcast_one_to_all(buf)
    return bytes(np.asarray(synced)).rstrip(b"\x00").decode()


def sync_min_count(count: Optional[int]) -> Optional[int]:
    """Global minimum of a per-host count (one allgather); None stays None.

    Use for anything that must be IDENTICAL across hosts but is derived
    from per-host data shards — e.g. a step-indexed LR-schedule horizon:
    shards can differ by one batch, and baking different horizons into
    each host's jitted step silently desynchronises replicated params.
    Single-process: identity.
    """
    if count is None or jax.process_count() == 1:
        return count
    import numpy as np
    from jax.experimental import multihost_utils

    counts = multihost_utils.process_allgather(np.asarray(int(count)))
    return int(np.min(counts))


def lockstep_batches(iterator, num_batches: Optional[int] = None):
    """Yield from a per-host batch iterator while EVERY process still has a
    batch.

    Per-host shards can differ by one batch (uneven sample counts); under
    SPMD a host entering a collective alone deadlocks the pod.  When this
    host's batch count is known up front (`num_batches` — computable from
    shard sizes with `drop_remainder`, see the loaders' `num_batches()`),
    ONE allgather exchanges the counts and the stream then drains
    `min(counts)` batches with no further host collectives.  With unknown
    counts (tfrecord shards) it falls back to a tiny have-a-batch flag
    allgather per step — the equivalent of tf.data's global
    `drop_remainder` the reference got from
    `strategy.distribute_datasets_from_function`.  Single-process:
    zero-overhead passthrough.
    """
    if jax.process_count() == 1:
        yield from iterator
        return
    import numpy as np
    from jax.experimental import multihost_utils

    it = iter(iterator)
    if num_batches is not None:
        counts = multihost_utils.process_allgather(np.asarray(int(num_batches)))
        for _ in range(int(np.min(counts))):
            # a shortfall vs the announced count must fail loudly: silently
            # stopping early would desync the pod at the next collective
            yield next(it)
        return
    while True:
        try:
            batch = next(it)
            have = 1
        except StopIteration:
            batch, have = None, 0
        flags = multihost_utils.process_allgather(np.asarray(have))
        if int(np.min(flags)) == 0:
            return
        yield batch


def host_local_batch_to_global(batch, mesh: Mesh):
    """Assemble per-host numpy batches into one global data-sharded array.

    Each process passes its local shard (global_batch / process_count rows);
    the result is a jax.Array sharded over the ``data`` axis spanning all
    hosts — the analog of the per-replica dataset TPUStrategy distributed.
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if isinstance(batch, dict):
        return {
            k: jax.make_array_from_process_local_data(sharding, v)
            for k, v in batch.items()
        }
    return jax.make_array_from_process_local_data(sharding, batch)


def lockstep_bucket_batches(iterator, repad):
    """Lockstep a BUCKETED per-host batch stream via per-step shape consensus.

    Bucketed loaders emit per-bucket audio shapes
    (`data/loaders.py::_bucket_batches`), and each host's bucket fill order
    depends on its own shard's length distribution — but multi-host SPMD
    needs every host presenting the SAME local shape each step (the global
    array assembly and the compiled program both demand it; the reference's
    pod recipe sidesteps this only by truncating everything to one shape,
    `/root/reference/src/data_utils.py:75-78`).

    One tiny int allgather per step exchanges ``(have_batch, audio_len)``;
    the consensus shape is the MAX audio length over hosts, and each host
    brings its batch to it with ``repad`` (the loaders'
    ``repad_batch`` — pad-id audio, zero mask).  Mask-aware / length-aware
    training keeps the extra padding out of the loss exactly as
    within-bucket padding already is, and the compiled-shape count stays
    bounded by the bucket set.  The stream stops when ANY host runs dry
    (training semantics, like `lockstep_batches`).  Single-process:
    zero-overhead passthrough.
    """
    if jax.process_count() == 1:
        yield from iterator
        return
    import numpy as np
    from jax.experimental import multihost_utils

    it = iter(iterator)
    while True:
        try:
            batch = next(it)
            have, blen = 1, int(batch["speech"].shape[1])
        except StopIteration:
            batch, have, blen = None, 0, 0
        info = multihost_utils.process_allgather(
            np.asarray([have, blen], np.int64)
        )
        if int(np.min(info[:, 0])) == 0:
            return
        yield repad(batch, int(np.max(info[:, 1])))
