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

import pytest

# slow tier: real two-process jax.distributed clusters
pytestmark = pytest.mark.slow

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

    # pre-counted path: ONE allgather of the counts, then no per-step
    # collectives — must agree with the flag-per-step result
    batches = list(multihost.lockstep_batches(iter([local] * n), num_batches=n))
    assert len(batches) == 2, len(batches)

    # hosts with uneven counts must agree on the global minimum (the
    # LR-schedule horizon contract in cli.pretrain); None passes through
    assert multihost.sync_min_count(n) == 2, multihost.sync_min_count(n)
    assert multihost.sync_min_count(None) is None

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


_TRAIN_WORKER = textwrap.dedent(
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
    from gsoc_wav2vec2_tpu import Wav2Vec2Config
    from gsoc_wav2vec2_tpu.models.modeling import init_wav2vec2_for_ctc_params
    from gsoc_wav2vec2_tpu.parallel import (
        make_mesh, multihost, replicated, shard_params,
    )
    from gsoc_wav2vec2_tpu.training import (
        TrainState, create_optimizer, make_train_step,
    )

    config = Wav2Vec2Config(
        hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
        filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
    )
    mesh = make_mesh(data=4, model=1)
    params = shard_params(
        init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config), mesh
    )
    tx = create_optimizer(1e-3)
    state = TrainState(
        step=jax.device_put(jnp.zeros((), jnp.int32), replicated(mesh)),
        params=params,
        opt_state=jax.jit(tx.init)(params),
    )
    global_batch = 4
    step = make_train_step(
        config, tx, division_factor=global_batch, with_attention_mask=False,
        compute_dtype=jnp.float32, mesh=mesh,
    )

    # each host decodes only its slice — same construction as cli.train
    rng = np.random.default_rng(7)  # SAME data on both hosts via same seed
    all_speech = rng.standard_normal((global_batch, 4000)).astype(np.float32)
    all_labels = (rng.integers(1, 31, (global_batch, 8))).astype(np.int32)
    lo, hi = pid * 2, pid * 2 + 2
    local = {"speech": all_speech[lo:hi], "labels": all_labels[lo:hi]}

    gbatch = multihost.host_local_batch_to_global(local, mesh)
    root = jax.device_put(jax.random.PRNGKey(3), replicated(mesh))
    losses = []
    for _ in range(2):
        state, metrics = step(state, gbatch, root)
        losses.append(float(metrics["loss"]))
    # every host must see the SAME global loss (SPMD over the full batch)
    print(f"proc {pid} losses: {losses[0]:.6f} {losses[1]:.6f}", flush=True)
    assert all(np.isfinite(l) for l in losses)
    print(f"proc {pid}: OK", flush=True)
    """
)


def test_two_process_training_step(tmp_path):
    """The trainer's multi-host hot path for real: two processes assemble a
    global batch from per-host slices and take sharded train steps; both
    must report the same global loss."""
    import re

    worker = tmp_path / "train_worker.py"
    worker.write_text(_TRAIN_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd="/root/repo",
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    losses = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        m = re.search(r"losses: ([\d.]+) ([\d.]+)", out)
        assert m, out[-1000:]
        losses.append((float(m.group(1)), float(m.group(2))))
    assert losses[0] == losses[1], f"hosts disagree on the global loss: {losses}"


_BUCKET_TRAIN_WORKER = textwrap.dedent(
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
    from gsoc_wav2vec2_tpu import Wav2Vec2Config
    from gsoc_wav2vec2_tpu.data.loaders import CommonDataLoader
    from gsoc_wav2vec2_tpu.models.modeling import init_wav2vec2_for_ctc_params
    from gsoc_wav2vec2_tpu.parallel import (
        make_mesh, multihost, replicated, shard_params,
    )
    from gsoc_wav2vec2_tpu.training import (
        TrainState, create_optimizer, make_train_step,
    )

    config = Wav2Vec2Config(
        hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
        filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
    )
    mesh = make_mesh(data=4, model=1)
    params = shard_params(
        init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config), mesh
    )
    tx = create_optimizer(1e-3)
    state = TrainState(
        step=jax.device_put(jnp.zeros((), jnp.int32), replicated(mesh)),
        params=params,
        opt_state=jax.jit(tx.init)(params),
    )
    step = make_train_step(
        config, tx, division_factor=4, with_attention_mask=True,
        length_aware=True, compute_dtype=jnp.float32, mesh=mesh,
    )

    loader = CommonDataLoader(
        batch_size=2, buffer_size=16, audio_pad_id=0, labels_pad_id=0,
        audio_maxlen=2000, labels_maxlen=8, bucket_boundaries=[1000, 2000],
    )
    # SAME global data on both hosts via the same seed; host 0 takes the
    # first 4 samples, host 1 the last 4 — bucket fill order DIVERGES
    # (host 0 flushes bucket 1000 first, host 1 bucket 2000 first)
    rng = np.random.default_rng(100)
    lens = (800, 900, 1800, 1900, 1700, 1600, 850, 950)
    audios = [rng.standard_normal(n).astype(np.float32) * 0.1 for n in lens]
    labels = [rng.integers(1, 31, 4).astype(np.int32) for _ in lens]
    mine = range(4 * pid, 4 * pid + 4)
    stream = loader.batchify(
        iter([(audios[i], labels[i]) for i in mine]),
        seed=None, drop_remainder=True,
    )

    root = jax.device_put(jax.random.PRNGKey(5), replicated(mesh))
    shapes, losses = [], []
    for batch in multihost.lockstep_bucket_batches(
        stream, repad=loader.repad_batch
    ):
        shapes.append(int(batch["speech"].shape[1]))
        gbatch = multihost.host_local_batch_to_global(
            {k: batch[k] for k in ("speech", "labels", "attention_mask")},
            mesh,
        )
        state, metrics = step(state, gbatch, root)
        losses.append(float(metrics["loss"]))
    # consensus shape each step is the max bucket over hosts: 2000 twice
    assert shapes == [2000, 2000], shapes
    assert all(np.isfinite(l) for l in losses)
    print(f"proc {pid} losses: " + " ".join(f"{l:.8f}" for l in losses),
          flush=True)
    print(f"proc {pid}: OK", flush=True)
    """
)


def test_two_process_bucketed_training_lockstep_and_parity(tmp_path):
    """Multi-host bucketed training (the round-4 lift of the single-host
    restriction): two processes with DIVERGING per-host bucket orders must
    (a) agree on a consensus shape every step, (b) agree on the global
    loss, and (c) match a single-process run over the identical global
    batches."""
    import re

    import numpy as np

    worker = tmp_path / "bucket_train_worker.py"
    worker.write_text(_BUCKET_TRAIN_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd="/root/repo",
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    losses = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        m = re.search(r"losses: ([\d.]+) ([\d.]+)", out)
        assert m, out[-1000:]
        losses.append((float(m.group(1)), float(m.group(2))))
    assert losses[0] == losses[1], f"hosts disagree: {losses}"

    # single-process reference over the SAME global batches: host0's
    # bucket-1000 batch (repadded to the 2000 consensus) + host1's
    # bucket-2000 batch, then the mirror-image second step
    import jax
    import jax.numpy as jnp

    from gsoc_wav2vec2_tpu import Wav2Vec2Config
    from gsoc_wav2vec2_tpu.data.loaders import CommonDataLoader
    from gsoc_wav2vec2_tpu.models.modeling import init_wav2vec2_for_ctc_params
    from gsoc_wav2vec2_tpu.parallel import make_mesh, replicated, shard_params
    from gsoc_wav2vec2_tpu.training import (
        TrainState, create_optimizer, make_train_step,
    )

    config = Wav2Vec2Config(
        hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
        filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
    )
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    params = shard_params(
        init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config), mesh
    )
    tx = create_optimizer(1e-3)
    state = TrainState(
        step=jax.device_put(jnp.zeros((), jnp.int32), replicated(mesh)),
        params=params,
        opt_state=jax.jit(tx.init)(params),
    )
    step = make_train_step(
        config, tx, division_factor=4, with_attention_mask=True,
        length_aware=True, compute_dtype=jnp.float32, mesh=mesh,
    )
    loader = CommonDataLoader(
        batch_size=2, buffer_size=16, audio_pad_id=0, labels_pad_id=0,
        audio_maxlen=2000, labels_maxlen=8, bucket_boundaries=[1000, 2000],
    )
    rng = np.random.default_rng(100)
    lens = (800, 900, 1800, 1900, 1700, 1600, 850, 950)
    audios = [rng.standard_normal(n).astype(np.float32) * 0.1 for n in lens]
    labels = [rng.integers(1, 31, 4).astype(np.int32) for _ in lens]

    def host_batches(idx):
        stream = loader.batchify(
            iter([(audios[i], labels[i]) for i in idx]),
            seed=None, drop_remainder=True,
        )
        return [loader.repad_batch(b, 2000) for b in stream]

    h0, h1 = host_batches(range(4)), host_batches(range(4, 8))
    root = jax.device_put(jax.random.PRNGKey(5), replicated(mesh))
    ref_losses = []
    for b0, b1 in zip(h0, h1):
        gbatch = {
            k: jnp.concatenate([jnp.asarray(b0[k]), jnp.asarray(b1[k])])
            for k in ("speech", "labels", "attention_mask")
        }
        state, metrics = step(state, gbatch, root)
        ref_losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(
        losses[0], ref_losses, rtol=1e-5,
        err_msg="two-process bucketed losses diverge from single-process",
    )


_BUCKET_EVAL_WORKER = textwrap.dedent(
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
    from gsoc_wav2vec2_tpu import RobustWav2Vec2Config
    from gsoc_wav2vec2_tpu.evaluation import GreedyCTCEvaluator
    from gsoc_wav2vec2_tpu.models.modeling import init_wav2vec2_for_ctc_params
    from gsoc_wav2vec2_tpu.parallel import make_mesh

    # robust family: per-frame norms + masked attention make decodes
    # padding-invariant, so consensus re-padding cannot change the WER
    config = RobustWav2Vec2Config(
        hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
        filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
    )
    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(1), config)
    mesh = make_mesh(data=4, model=1)
    ev = GreedyCTCEvaluator(
        config, params, compute_dtype=jnp.float32, mesh=mesh,
    )
    assert ev._multiprocess

    rng = np.random.default_rng(7)
    lens = (800, 1800, 900, 1700, 1900, 850)
    texts = ["HELLO WORLD", "A B C", "THE CAT", "DOG RAN", "X Y", "OK THEN"]
    audios = [rng.standard_normal(n).astype(np.float32) for n in lens]
    # host 0: first three (bucket order 1000-flush then 2000-tail);
    # host 1: last three (2000-flush then 1000-tail) — orders DIVERGE
    mine = range(3 * pid, 3 * pid + 3)
    samples = [(audios[i], texts[i]) for i in mine]
    score, n = ev.evaluate_bucketed(
        iter(samples), batch_size=2, buckets=[1000, 2000]
    )
    assert n == 6, n  # global count, aggregated over hosts
    print(f"proc {pid} wer: {score:.8f} n={n}", flush=True)
    print(f"proc {pid}: OK", flush=True)
    """
)


def test_two_process_bucketed_eval_matches_single_process(tmp_path):
    """Multi-host bucketed WER (the round-4 lift of the NotImplementedError):
    both hosts must report the same aggregated WER, and it must equal a
    single-process bucketed evaluation of the full corpus."""
    import re

    import numpy as np

    worker = tmp_path / "bucket_eval_worker.py"
    worker.write_text(_BUCKET_EVAL_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd="/root/repo",
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    scores = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        m = re.search(r"wer: ([\d.]+) n=(\d+)", out)
        assert m, out[-1000:]
        scores.append(float(m.group(1)))
        assert int(m.group(2)) == 6
    assert scores[0] == scores[1], f"hosts disagree on global WER: {scores}"

    # single-process reference on the full corpus, same buckets
    import jax
    import jax.numpy as jnp

    from gsoc_wav2vec2_tpu import RobustWav2Vec2Config
    from gsoc_wav2vec2_tpu.evaluation import GreedyCTCEvaluator
    from gsoc_wav2vec2_tpu.models.modeling import init_wav2vec2_for_ctc_params

    config = RobustWav2Vec2Config(
        hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
        filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
    )
    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(1), config)
    ev = GreedyCTCEvaluator(config, params, compute_dtype=jnp.float32)
    rng = np.random.default_rng(7)
    lens = (800, 1800, 900, 1700, 1900, 850)
    texts = ["HELLO WORLD", "A B C", "THE CAT", "DOG RAN", "X Y", "OK THEN"]
    audios = [rng.standard_normal(n).astype(np.float32) for n in lens]
    ref_score, ref_n = ev.evaluate_bucketed(
        iter(zip(audios, texts)), batch_size=2, buckets=[1000, 2000]
    )
    assert ref_n == 6
    np.testing.assert_allclose(
        scores[0], ref_score, atol=1e-9,
        err_msg="two-process bucketed WER diverges from single-process",
    )
