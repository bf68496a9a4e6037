"""TRUE multi-process validation of the multi-host helpers.

The other distributed tests simulate hosts inside one process; here two
actual processes form a `jax.distributed` cluster over the CPU backend
(2 devices each → a 4-device global mesh) and exercise the cross-process
primitives the TPU-pod trainer relies on: host-local→global batch
assembly, run-id broadcast from process 0, and lockstep draining of
uneven per-host streams.  This is the closest a single machine gets to
the reference's "just run it on a v3-8 pod" story (SURVEY §4).
"""

import os
import socket
import subprocess
import sys
import textwrap

_WORKER = textwrap.dedent(
    """
    import os, sys

    pid = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    sys.path.insert(0, "/root/repo")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=2, process_id=pid
    )
    import jax.numpy as jnp
    import numpy as np
    from gsoc_wav2vec2_tpu.parallel import make_mesh, multihost

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4
    mesh = make_mesh(data=4, model=1)

    # host-local batch slices -> one global array
    local = {"x": np.full((2, 3), float(pid), np.float32)}
    gbatch = multihost.host_local_batch_to_global(local, mesh)
    assert gbatch["x"].shape == (4, 3)

    @jax.jit
    def total(b):
        return jnp.sum(b["x"])

    # host 0 contributes zeros, host 1 ones -> global sum is 6
    got = float(total(gbatch))
    assert got == 6.0, got

    # run ids must come from process 0 on every host
    rid = multihost.sync_run_id(f"host-{pid}-id")
    assert rid == "host-0-id", rid

    # uneven streams (3 vs 2 batches) must stop in lockstep, not deadlock
    n = 3 - pid
    batches = list(multihost.lockstep_batches(iter([local] * n)))
    assert len(batches) == 2, len(batches)

    print(f"proc {pid}: OK", flush=True)
    """
)


def test_two_process_cluster(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd="/root/repo",
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid}: OK" in out
