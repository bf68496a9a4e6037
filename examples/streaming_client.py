"""Stream a WAV file to a running `cli.serve` daemon and print live partials.

The reference has no serving/streaming story at all (its notebooks stop at
one-shot SavedModel inference).  Start a server, then:

    python -m gsoc_wav2vec2_tpu.cli.serve --model_dir M --port 8057 &
    python examples/streaming_client.py --server http://127.0.0.1:8057 \
        --file clip.wav --piece_s 0.5

Stdlib only (urllib + wave).  Pieces go up as raw little-endian float32
(`application/octet-stream`); the server zscores each model window by
default (`normalize=window`), which is what you want for live audio.
Smoke-tested in `tests/test_examples.py`.
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.request
import wave

import numpy as np


def _post(url: str, body: bytes, content_type: str, timeout: float = 120.0):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": content_type}
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def main() -> None:
    parser = argparse.ArgumentParser("streaming transcription client")
    parser.add_argument("--server", required=True, help="http://host:port")
    parser.add_argument("--file", required=True, help="16 kHz mono WAV")
    parser.add_argument("--piece_s", type=float, default=0.5,
                        help="seconds of audio per uploaded piece")
    parser.add_argument("--chunk_samples", type=int, default=246000)
    parser.add_argument("--context_samples", type=int, default=16000)
    parser.add_argument("--normalize", choices=("window", "none"),
                        default="window")
    args = parser.parse_args()

    with wave.open(args.file, "rb") as w:
        if w.getframerate() != 16000 or w.getnchannels() != 1:
            sys.exit(f"{args.file}: want 16 kHz mono WAV")
        pcm = np.frombuffer(
            w.readframes(w.getnframes()), dtype="<i2"
        ).astype(np.float32) / 32768.0

    opened = _post(
        args.server + "/v1/stream",
        json.dumps({
            "chunk_samples": args.chunk_samples,
            "context_samples": args.context_samples,
            "normalize": args.normalize,
        }).encode(),
        "application/json",
    )
    sid = opened["session"]
    piece = max(1, int(args.piece_s * 16000))
    last = ""
    for lo in range(0, len(pcm), piece):
        out = _post(
            f"{args.server}/v1/stream/{sid}",
            pcm[lo : lo + piece].astype("<f4").tobytes(),
            "application/octet-stream",
        )
        if out["partial"] != last:
            last = out["partial"]
            print(f"[{(lo + piece) / 16000.0:6.2f}s] {last}", flush=True)
    fin = _post(
        f"{args.server}/v1/stream/{sid}/finish", b"", "application/json"
    )
    print(json.dumps(fin))


if __name__ == "__main__":
    main()
