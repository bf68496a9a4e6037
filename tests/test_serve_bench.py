"""Serving load benchmark (`cli/serve_bench.py`) — end-to-end on CPU.

Functional checks only (latency NUMBERS are meaningless on the CPU
backend; the real-chip measurements live in COMPONENTS.md): the harness
must spawn a server, drive concurrent mixed-length clients, observe
dynamic batching, compute percentiles, run the batch-1 baseline, and
tear the server down."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_serve import _make_model_dir  # reuse the tiny model


def test_percentile_nearest_rank():
    from gsoc_wav2vec2_tpu.cli.serve_bench import percentile

    vals = [10.0, 20.0, 30.0, 40.0, 50.0]
    assert percentile(vals, 50) == 30.0
    assert percentile(vals, 99) == 50.0
    assert percentile(vals, 1) == 10.0
    assert percentile([7.0], 99) == 7.0


def test_wav_payload_roundtrip():
    import io
    import wave

    from gsoc_wav2vec2_tpu.cli.serve_bench import wav_bytes

    audio = np.sin(np.arange(1600) / 8.0).astype(np.float32)
    raw = wav_bytes(audio)
    with wave.open(io.BytesIO(raw)) as w:
        assert w.getnchannels() == 1
        assert w.getframerate() == 16000
        assert w.getnframes() == 1600


@pytest.mark.slow
def test_serve_bench_cli_end_to_end(tmp_path):
    """Spawn-server mode: mixed lengths, 4 concurrent clients, baseline
    pass, one JSON line out, server gone afterwards."""
    model_dir = _make_model_dir(tmp_path)
    env = dict(
        os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu",
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [
            sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.serve_bench",
            "--model_dir", model_dir,
            "--clients", "4", "--requests", "12",
            "--lengths", "3000,6000",
            "--baseline",
            "--serve_args",
            "--buckets 4000,8000 --max_batch 4 --batch_window_ms 300",
        ],
        capture_output=True, text=True, timeout=600,
        env=env, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-3000:]
    report = json.loads(r.stdout.strip().splitlines()[-1])
    load = report["load"]
    assert load["requests"] == 12
    assert load["errors"] == 0
    assert load["p50_ms"] <= load["p99_ms"] <= load["max_ms"]
    assert load["server_p50_ms"] > 0
    assert load["audio_sec_per_s"] > 0
    # 4 concurrent clients inside a 300 ms window MUST co-schedule
    assert load["mean_batch_occupancy"] > 1.0
    b1 = report["batch1"]
    assert b1["errors"] == 0
    assert b1["clients"] == 1
    # sequential clients can never batch
    assert b1["mean_batch_occupancy"] == 1.0
    assert report["batching_speedup"] > 0
