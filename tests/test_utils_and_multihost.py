"""Coverage for the profiling helpers and multihost batch assembly."""

import jax
import jax.numpy as jnp
import numpy as np

from gsoc_wav2vec2_tpu.parallel import batch_sharding, make_mesh, multihost
from gsoc_wav2vec2_tpu.utils.profiling import timeit, trace


def test_timeit_forces_execution(tmp_path):
    x = jnp.ones((256, 256))
    f = jax.jit(lambda: x @ x)
    dt = timeit(f, iters=3, warmup=1)
    assert dt > 0


def test_trace_writes_profile(tmp_path):
    log_dir = str(tmp_path / "trace")
    with trace(log_dir):
        jnp.sum(jnp.ones((64, 64))).block_until_ready()
    import os

    files = [
        os.path.join(r, f) for r, _, fs in os.walk(log_dir) for f in fs
    ]
    assert files, "profiler produced no trace files"


def test_multihost_initialize_single_process_noop():
    # single process: must be a silent no-op (reference required a TPU
    # resolver even locally)
    multihost.initialize()
    assert jax.process_count() == 1


def test_host_local_batch_to_global():
    mesh = make_mesh(data=8, model=1)
    local = {
        "speech": np.random.default_rng(0).standard_normal((16, 100)).astype(np.float32),
        "labels": np.zeros((16, 8), np.int32),
    }
    global_batch = multihost.host_local_batch_to_global(local, mesh)
    assert global_batch["speech"].shape == (16, 100)
    assert global_batch["speech"].sharding == batch_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(global_batch["speech"]), local["speech"])
