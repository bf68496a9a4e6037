"""HTTP serving daemon (`cli/serve.py`): dynamic batching, bucketed
shapes, WAV/FLAC/JSON payloads, long-form fallback, error paths.

The server runs as a real subprocess serving on an ephemeral port; clients
use stdlib urllib.  Content assertions compare the server against ITSELF
(batched == solo, wav payload == quantised-json payload, repeat ==
repeat): greedy decode is deterministic within one compiled program, but
near-tie argmaxes on a random-weight model can flip across processes
compiled under different XLA flags (the test process runs with 8 virtual
devices, the server with 1), so cross-process string equality would be
flaky by construction.  Model correctness itself is covered by the parity
suite."""

import io
import json
import os
import signal
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request
import wave

import numpy as np
import pytest

from gsoc_wav2vec2_tpu import Wav2Vec2Config, Wav2Vec2ForCTC

# slow tier: subprocess HTTP servers with bucket-warmup compiles
pytestmark = pytest.mark.slow

TINY = dict(
    hidden_size=64, num_heads=4, num_layers=2, intermediate_size=128,
    filter_sizes=[32, 32], kernal_sizes=[10, 3], strides=[5, 2],
)
BUCKETS = "4000,8000"
MAX_BATCH = 4


def _wav_bytes(audio_f32: np.ndarray, rate: int = 16000) -> bytes:
    pcm = np.clip(audio_f32 * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _post(url, body, content_type, timeout=60):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": content_type}
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _make_model_dir(tmp) -> str:
    model_dir = str(tmp / "model")
    Wav2Vec2ForCTC(
        Wav2Vec2Config(**TINY, dropout=0.0, apply_spec_augment=False,
                       survival_prob=1.0),
        seed=0,
    ).save_pretrained(model_dir)
    return model_dir


def _spawn_server(model_dir: str, extra_args=(), device_count: int = 1):
    env = dict(
        os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={device_count}",
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "gsoc_wav2vec2_tpu.cli.serve",
            "--model_dir", model_dir, "--port", "0",
            "--buckets", BUCKETS, "--max_batch", str(MAX_BATCH),
            "--batch_window_ms", "300", *extra_args,
        ],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd="/root/repo",
    )
    base = None
    deadline = time.time() + 300
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line and proc.poll() is not None:
            raise RuntimeError(f"server died: {proc.stderr.read()[-3000:]}")
        if line.startswith("serving on "):
            base = line.split("serving on ", 1)[1].strip()
            break
    assert base, "server never reported its address"
    return proc, base


def _kill_server(proc) -> None:
    proc.send_signal(signal.SIGTERM)
    try:
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait(timeout=30)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    model_dir = _make_model_dir(tmp)
    proc, base = _spawn_server(model_dir)
    # healthz must answer once serving
    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        health = json.loads(resp.read())
    assert health["status"] == "ok"
    assert health["buckets"] == [4000, 8000]

    yield {"base": base}

    _kill_server(proc)


def _transcribe_json(base: str, audio: np.ndarray):
    return _post(
        base + "/v1/transcribe",
        json.dumps({"audio": np.asarray(audio, np.float32).tolist()}).encode(),
        "application/json",
    )


def test_json_transcribe_deterministic(server):
    rng = np.random.default_rng(0)
    audio = np.sin(np.arange(3000) / 4.0).astype(np.float32) + 0.01 * (
        rng.standard_normal(3000).astype(np.float32)
    )
    status, out = _transcribe_json(server["base"], audio)
    assert status == 200, out
    assert isinstance(out["transcription"], str)
    assert out["audio_seconds"] == pytest.approx(3000 / 16000, abs=1e-3)
    status2, out2 = _transcribe_json(server["base"], audio)
    assert status2 == 200 and out2["transcription"] == out["transcription"]


def test_wav_payload_matches_quantised_json(server):
    audio = np.sin(np.arange(5000) / 9.0).astype(np.float32) * 0.5
    status, out = _post(
        server["base"] + "/v1/transcribe", _wav_bytes(audio), "audio/wav"
    )
    assert status == 200, out
    # the WAV leg int16-quantises the waveform; the same quantised floats
    # through the JSON leg must transcribe identically (payload decoding
    # is the only difference)
    quantised = (
        np.clip(audio * 32767.0, -32768, 32767).astype(np.int16) / 32768.0
    ).astype(np.float32)
    status2, out2 = _transcribe_json(server["base"], quantised)
    assert status2 == 200
    assert out["transcription"] == out2["transcription"]


def test_concurrent_requests_share_a_batch(server):
    rng = np.random.default_rng(1)
    audios = [
        (np.sin(np.arange(3500) / (3.0 + i))
         + 0.02 * rng.standard_normal(3500)).astype(np.float32)
        for i in range(MAX_BATCH)
    ]
    # solo answers first (sequential requests rarely co-batch, and equality
    # below doesn't depend on whether they did)
    solo = []
    for audio in audios:
        status, out = _transcribe_json(server["base"], audio)
        assert status == 200, out
        solo.append(out["transcription"])

    results = [None] * MAX_BATCH

    def worker(i):
        results[i] = _transcribe_json(server["base"], audios[i])

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(MAX_BATCH)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, (status, out) in enumerate(results):
        assert status == 200, out
        # co-batched result must equal the solo result: batching is a
        # scheduling decision, never a semantic one
        assert out["transcription"] == solo[i]
    # with a 300 ms batching window and simultaneous submission, at least
    # one dispatch must have carried multiple requests
    assert max(out["batched_with"] for _, out in results) >= 2


def test_long_audio_uses_longform_path(server):
    audio = (np.sin(np.arange(20000) / 5.0) * 0.3).astype(np.float32)
    status, out = _post(
        server["base"] + "/v1/transcribe",
        json.dumps({"audio": audio.tolist()}).encode(),
        "application/json",
    )
    assert status == 200, out
    assert isinstance(out["transcription"], str)
    assert out["batched_with"] == 1  # served individually


def test_error_paths(server):
    base = server["base"]
    status, out = _post(base + "/v1/transcribe", b"\x00garbage\x01", "")
    assert status == 400 and "unrecognised" in out["error"]
    status, out = _post(
        base + "/v1/transcribe",
        json.dumps({"audio": [0.0], "sample_rate": 8000}).encode(),
        "application/json",
    )
    assert status == 400 and "sample_rate" in out["error"]
    status, out = _post(
        base + "/v1/transcribe", json.dumps({"nope": 1}).encode(),
        "application/json",
    )
    assert status == 400
    status, out = _post(base + "/v1/other", b"{}", "application/json")
    assert status == 404
    # health endpoint counts completed requests (self-contained: do one
    # successful request and watch the counter move)
    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        before = json.loads(resp.read())["requests"]
    status, _ = _post(
        base + "/v1/transcribe",
        json.dumps({"audio": [0.1] * 600}).encode(),
        "application/json",
    )
    assert status == 200
    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        after = json.loads(resp.read())["requests"]
    assert after >= before + 1


def test_timestamps_word_level(server):
    """`timestamps` via JSON key or query param returns word segments
    consistent with the transcription; plain requests carry no words."""
    base = server["base"]
    rng = np.random.default_rng(7)
    audio = (np.sin(np.arange(3600) / 3.5)
             + 0.02 * rng.standard_normal(3600)).astype(np.float32)
    status, plain = _transcribe_json(base, audio)
    assert status == 200 and "words" not in plain
    status, out = _post(
        base + "/v1/transcribe",
        json.dumps({"audio": audio.tolist(), "timestamps": True}).encode(),
        "application/json",
    )
    assert status == 200, out
    assert out["transcription"] == plain["transcription"]
    words = out["words"]
    assert " ".join(w["word"] for w in words).split() == \
        out["transcription"].split()
    prev_end = 0.0
    for w in words:
        assert 0.0 <= w["start"] < w["end"] <= out["audio_seconds"] + 0.1
        assert w["start"] >= prev_end
        prev_end = w["end"]
        assert 0.0 < w["confidence"] <= 1.0
    # binary payloads ask via the query parameter
    status, out2 = _post(
        base + "/v1/transcribe?timestamps=1", _wav_bytes(audio), "audio/wav"
    )
    assert status == 200, out2
    assert isinstance(out2["words"], list)


def test_align_endpoint(server):
    """/v1/align: forced alignment as a service — JSON and binary legs
    agree (on identically-quantised audio), words are monotone with
    confidences, and infeasible/missing transcripts answer 400."""
    audio = (np.sin(np.arange(5000) / 7.0) * 0.4).astype(np.float32)
    quantised = (
        np.clip(audio * 32767.0, -32768, 32767).astype(np.int16) / 32768.0
    ).astype(np.float32)
    body = json.dumps(
        {"audio": quantised.tolist(), "transcript": "hello,  world!"}
    ).encode()
    status, out = _post(server["base"] + "/v1/align", body, "application/json")
    assert status == 200, out
    assert out["transcription"] == "HELLO WORLD"
    words = out["words"]
    assert [w["word"] for w in words] == ["HELLO", "WORLD"]
    prev_end = 0
    for w in words:
        assert prev_end <= w["start_frame"] < w["end_frame"]
        prev_end = w["end_frame"]
        assert 0.0 < w["confidence"] <= 1.0

    # binary WAV leg with ?transcript= must match the JSON leg exactly
    # (same server, same quantised samples — only payload parsing differs)
    status2, out2 = _post(
        server["base"] + "/v1/align?transcript=hello%20world",
        _wav_bytes(audio), "audio/wav",
    )
    assert status2 == 200, out2
    assert out2["transcription"] == out["transcription"]
    assert out2["words"] == words

    # error contract: missing transcript and infeasible transcript -> 400
    status3, out3 = _post(
        server["base"] + "/v1/align",
        json.dumps({"audio": quantised.tolist()}).encode(),
        "application/json",
    )
    assert status3 == 400 and "transcript" in out3["error"]
    status4, out4 = _post(
        server["base"] + "/v1/align",
        json.dumps({"audio": quantised[:300].tolist(),
                    "transcript": "THE QUICK BROWN FOX " * 40}).encode(),
        "application/json",
    )
    assert status4 == 400 and "frames" in out4["error"]

    # healthz counts alignments separately from transcriptions
    with urllib.request.urlopen(server["base"] + "/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["aligns"] >= 2


def test_timestamps_rejected_on_beam_server(tmp_path):
    """A beam-search server keeps no frame alignment: timestamp requests
    answer 400 before any device work."""
    model_dir = _make_model_dir(tmp_path)
    proc, base = _spawn_server(
        model_dir, extra_args=("--beam_width", "3", "--no_warmup")
    )
    try:
        status, out = _post(
            base + "/v1/transcribe",
            json.dumps({"audio": [0.1] * 600, "timestamps": True}).encode(),
            "application/json",
        )
        assert status == 400 and "greedy" in out["error"]
    finally:
        _kill_server(proc)


def test_sharded_server_batches_over_mesh(tmp_path):
    """--sharded: batches shard over an 8-virtual-device data mesh; the
    served transcription must not depend on co-batching (batched == solo)."""
    model_dir = _make_model_dir(tmp_path)
    proc, base = _spawn_server(
        model_dir, extra_args=("--sharded",), device_count=8
    )
    try:
        rng = np.random.default_rng(5)
        audios = [
            (np.sin(np.arange(3200) / (2.0 + i))
             + 0.02 * rng.standard_normal(3200)).astype(np.float32)
            for i in range(MAX_BATCH)
        ]
        solo = []
        for audio in audios:
            status, out = _transcribe_json(base, audio)
            assert status == 200, out
            solo.append(out["transcription"])
        results = [None] * MAX_BATCH

        def worker(i):
            results[i] = _transcribe_json(base, audios[i])

        threads = [
            threading.Thread(target=worker, args=(i,))
            for i in range(MAX_BATCH)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, (status, out) in enumerate(results):
            assert status == 200, out
            assert out["transcription"] == solo[i]
        assert max(out["batched_with"] for _, out in results) >= 2
    finally:
        _kill_server(proc)


# -- streaming sessions (/v1/stream) ----------------------------------------


def _open_stream(base, **options):
    return _post(
        base + "/v1/stream",
        json.dumps(options).encode() if options else b"",
        "application/json",
    )


def _feed_json(base, sid, samples):
    return _post(
        base + f"/v1/stream/{sid}",
        json.dumps({"audio": np.asarray(samples, np.float32).tolist()}).encode(),
        "application/json",
    )


def test_stream_session_piecewise_equals_one_piece(server):
    """Two sessions over the same audio — many small feeds vs one big feed —
    must commit the identical final transcript, with monotone partials."""
    base = server["base"]
    audio = np.random.default_rng(7).standard_normal(9500).astype(np.float32)
    opts = dict(chunk_samples=3000, context_samples=500, normalize="none")

    code, opened = _open_stream(base, **opts)
    assert code == 200, opened
    sid = opened["session"]
    partials = []
    for lo in range(0, len(audio), 1300):
        code, out = _feed_json(base, sid, audio[lo : lo + 1300])
        assert code == 200, out
        partials.append(out["partial"])
    assert out["samples_fed"] == len(audio)
    code, fin = _post(base + f"/v1/stream/{sid}/finish", b"", "application/json")
    assert code == 200 and fin["audio_seconds"] == round(9500 / 16000, 3)
    for a, b in zip(partials, partials[1:] + [fin["transcription"]]):
        assert b.startswith(a)

    code, opened2 = _open_stream(base, **opts)
    sid2 = opened2["session"]
    code, _ = _feed_json(base, sid2, audio)
    code, fin2 = _post(
        base + f"/v1/stream/{sid2}/finish", b"", "application/json"
    )
    assert fin2["transcription"] == fin["transcription"]
    assert fin["transcription"], "random-weights argmax should be non-empty"


def test_stream_session_word_timestamps(server):
    """Opening a stream with {"timestamps": true} adds committed word
    segments to every feed/finish reply — live captions with times."""
    base = server["base"]
    audio = np.random.default_rng(11).standard_normal(9500).astype(np.float32)
    code, opened = _open_stream(
        base, chunk_samples=3000, context_samples=500, normalize="none",
        timestamps=True,
    )
    assert code == 200, opened
    sid = opened["session"]
    saw_words = False
    for lo in range(0, len(audio), 1300):
        code, out = _feed_json(base, sid, audio[lo : lo + 1300])
        assert code == 200 and "words" in out, out
        saw_words = saw_words or bool(out["words"])
    code, fin = _post(base + f"/v1/stream/{sid}/finish", b"", "application/json")
    assert code == 200, fin
    words = fin["words"]
    assert saw_words and words
    assert " ".join(w["word"] for w in words).split() == \
        fin["transcription"].split()
    prev_end = 0
    for w in words:
        assert prev_end <= w["start_frame"] < w["end_frame"]
        prev_end = w["end_frame"]
        assert 0.0 < w["confidence"] <= 1.0

    # a session opened WITHOUT timestamps keeps the lean replies
    code, opened2 = _open_stream(
        base, chunk_samples=3000, context_samples=500, normalize="none"
    )
    code, out = _feed_json(base, opened2["session"], audio[:2000])
    assert code == 200 and "words" not in out
    _post(base + f"/v1/stream/{opened2['session']}/finish", b"",
          "application/json")


def test_stream_octet_pieces_match_json_pieces(server):
    base = server["base"]
    audio = np.random.default_rng(9).standard_normal(7000).astype(np.float32)
    opts = dict(chunk_samples=3000, context_samples=500, normalize="none")
    finals = []
    for mode in ("json", "octet"):
        code, opened = _open_stream(base, **opts)
        sid = opened["session"]
        for lo in range(0, len(audio), 2000):
            piece = audio[lo : lo + 2000]
            if mode == "json":
                code, out = _feed_json(base, sid, piece)
            else:
                code, out = _post(
                    base + f"/v1/stream/{sid}",
                    piece.astype("<f4").tobytes(),
                    "application/octet-stream",
                )
            assert code == 200, out
        code, fin = _post(
            base + f"/v1/stream/{sid}/finish", b"", "application/json"
        )
        finals.append(fin["transcription"])
    assert finals[0] == finals[1]


def test_stream_window_normalization_default(server):
    """Default normalize="window": raw (unnormalized) audio still decodes;
    the session stays usable across feeds."""
    base = server["base"]
    raw = (
        3000.0
        * np.sin(np.arange(9500) / 5.0).astype(np.float32)
    )
    code, opened = _open_stream(base, chunk_samples=3000, context_samples=500)
    assert code == 200 and opened["normalize"] == "window"
    sid = opened["session"]
    for lo in range(0, len(raw), 4000):
        code, out = _feed_json(base, sid, raw[lo : lo + 4000])
        assert code == 200, out
    code, fin = _post(base + f"/v1/stream/{sid}/finish", b"", "application/json")
    assert code == 200 and isinstance(fin["transcription"], str)


def test_stream_error_paths(server):
    base = server["base"]
    # unknown session
    code, out = _feed_json(base, "s999999-0", np.zeros(10))
    assert code == 404 and "unknown" in out["error"]
    # bad normalize option
    code, out = _open_stream(base, normalize="global")
    assert code == 400
    # misaligned octet body
    code, opened = _open_stream(base)
    sid = opened["session"]
    code, out = _post(
        base + f"/v1/stream/{sid}", b"\x00\x01\x02",
        "application/octet-stream",
    )
    assert code == 400 and "float32" in out["error"]
    # finish closes the session: second finish is a 404
    code, _ = _post(base + f"/v1/stream/{sid}/finish", b"", "application/json")
    assert code == 200
    code, out = _post(base + f"/v1/stream/{sid}/finish", b"", "application/json")
    assert code == 404
    # health reports the stream counter
    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        assert json.loads(resp.read())["streams"] >= 1


def test_stream_sessions_reject_beam_at_unit_level():
    """StreamSessions.open refuses beam evaluators (HTTP layer maps the
    ValueError to a 400) — unit-level so no extra server spawn."""
    import jax

    from gsoc_wav2vec2_tpu.cli.serve import StreamSessions
    from gsoc_wav2vec2_tpu.evaluation import GreedyCTCEvaluator
    from gsoc_wav2vec2_tpu.models.modeling import init_wav2vec2_for_ctc_params

    config = Wav2Vec2Config(**TINY)
    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config)
    sessions = StreamSessions(
        GreedyCTCEvaluator(config, params, beam_width=4)
    )
    with pytest.raises(ValueError, match="greedy"):
        sessions.open({})
    # capacity guard
    greedy = StreamSessions(
        GreedyCTCEvaluator(config, params), max_sessions=1
    )
    greedy.open({})
    with pytest.raises(OverflowError, match="too many"):
        greedy.open({})
