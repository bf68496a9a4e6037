"""Headline benchmark: batched CTC inference throughput on one TPU chip.

Metric: real-time factor (RTF) — seconds of 16 kHz audio transcribed per
wall-clock second, Wav2Vec2ForCTC base (95M params), bf16, batch 16 at the
reference's fixed 246000-sample eval shape (`/root/reference/src/main.py:48-51`,
`export2hub.py:27-31`).

Baseline: the reference's best published latency is its ONNX CPU export —
0.84 s for a 3.125 s clip (final_report.md:62-67) ⇒ RTF 3.72.  Its TF
`jit_compile=True` path was 2.85 s ⇒ RTF 1.10.  `vs_baseline` is the speedup
over the ONNX number (the strongest reference configuration).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BATCH = 16
AUDIO_LEN = 246000  # 15.375 s at 16 kHz
SAMPLE_RATE = 16000
WARMUP = 3
ITERS = 15
BASELINE_RTF = 3.125 / 0.84  # reference ONNX export, final_report.md:62-67


def main() -> None:
    from gsoc_wav2vec2_tpu import Wav2Vec2Config
    from gsoc_wav2vec2_tpu.models.modeling import (
        init_wav2vec2_for_ctc_params,
        wav2vec2_for_ctc_forward,
    )

    config = Wav2Vec2Config()
    params = init_wav2vec2_for_ctc_params(jax.random.PRNGKey(0), config)
    speech = jax.random.normal(jax.random.PRNGKey(1), (BATCH, AUDIO_LEN), jnp.float32)

    @jax.jit
    def fwd(params, speech):
        logits = wav2vec2_for_ctc_forward(
            params, config, speech, training=False, compute_dtype=jnp.bfloat16
        )
        # scalar summary: fetching it forces the whole computation, which
        # `block_until_ready` alone does not guarantee through the remote
        # TPU tunnel used in this environment
        return jnp.sum(jnp.argmax(logits, axis=-1).astype(jnp.int32))

    for _ in range(WARMUP):
        float(fwd(params, speech))

    start = time.perf_counter()
    acc = None
    for _ in range(ITERS):
        acc = fwd(params, speech)
    float(acc)  # device->host readback: forces the chain to complete
    elapsed = time.perf_counter() - start

    audio_seconds = ITERS * BATCH * AUDIO_LEN / SAMPLE_RATE
    rtf = audio_seconds / elapsed
    print(
        json.dumps(
            {
                "metric": "inference_rtf_base_bf16_b16",
                "value": round(rtf, 2),
                "unit": "audio_sec/sec",
                "vs_baseline": round(rtf / BASELINE_RTF, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
