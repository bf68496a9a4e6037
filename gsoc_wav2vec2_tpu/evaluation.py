"""Batched, jitted WER evaluation harness.

The reference evaluates two ways (SURVEY.md §6):
  * variable-length, eager, batch-1 (3.3% WER but no compilation at all —
    `notebooks/librispeech_evaluation_WER_3.ipynb`), or
  * constant pad to 246000 under jit (fast but 6% WER —
    `librispeech_evaluation_WER_6.ipynb`), because padding frames enter the
    un-masked base model's attention.

This harness supports both of those and the upgrade the reference lacked:
**bucketed** evaluation — samples are grouped into a handful of length
buckets, each bucket shape compiles once, and padding within a bucket is
bounded, recovering no-padding accuracy at jit-compiled throughput.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .data.processor import Wav2Vec2Processor
from .models.config import Wav2Vec2Config
from .models.modeling import wav2vec2_for_ctc_forward
from .utils.metrics import wer


def default_buckets(max_len: int = 400000, num: int = 8) -> List[int]:
    """Bucket boundaries in waveform samples, multiples of 16000 (1 s),
    biased toward typical LibriSpeech utterance lengths."""
    edges = np.linspace(max_len / num, max_len, num)
    return [int(np.ceil(e / 16000) * 16000) for e in edges]


def plan_chunks(total_len: int, chunk: int, context: int, conv_output_length):
    """Window plan for long-form transcription.

    Returns [(sample_start, keep_frame_lo, keep_frame_hi)] such that windows
    of `chunk` samples starting at `sample_start` cover the waveform, each
    overlapping its neighbours by `context` samples on both sides, and the
    kept frame ranges tile the audio without double-counting: a window keeps
    frames [frames(context), frames(context + stride)) except the first
    (keeps from 0) and the last (keeps to its true end).
    """
    if chunk <= 2 * context:
        raise ValueError(f"chunk {chunk} must exceed 2x context {context}")
    stride = chunk - 2 * context
    f = lambda n: int(conv_output_length(int(n)))
    plan = []
    start = 0  # center-region start (samples)
    while start < total_len:
        win_start = max(0, start - context)
        center_end = min(start + stride, total_len)
        keep_lo = f(start - win_start) if start > 0 else 0
        if center_end < total_len:
            keep_hi = f(center_end - win_start)
        else:
            keep_hi = f(min(total_len - win_start, chunk))
        plan.append((win_start, keep_lo, keep_hi))
        start = center_end
    return plan


class GreedyCTCEvaluator:
    """Greedy-decode WER evaluation for `Wav2Vec2ForCTC` parameters.

    Device side: forward + argmax, compiled once per (batch, length) shape.
    Host side: CTC collapse + string join (`Wav2Vec2Processor.decode`).
    """

    def __init__(
        self,
        config: Wav2Vec2Config,
        params,
        *,
        compute_dtype=jnp.bfloat16,
        use_attention_mask: Optional[bool] = None,
    ):
        self.config = config
        self.params = params
        self.compute_dtype = compute_dtype
        self.tokenizer = Wav2Vec2Processor(is_tokenizer=True)
        self.use_attention_mask = (
            config.is_robust if use_attention_mask is None else use_attention_mask
        )
        self._jitted = {}

    def _step(self, with_mask: bool):
        if with_mask not in self._jitted:
            config, cdtype = self.config, self.compute_dtype

            def fn(params, speech, mask=None):
                logits = wav2vec2_for_ctc_forward(
                    params, config, speech, mask, training=False,
                    compute_dtype=cdtype,
                )
                preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                if mask is not None:
                    lengths = config.conv_output_length(
                        jnp.sum(mask.astype(jnp.int32), axis=-1)
                    ).astype(jnp.int32)
                else:
                    lengths = jnp.full((preds.shape[0],), preds.shape[1], jnp.int32)
                return preds, lengths

            self._jitted[with_mask] = jax.jit(fn)
        return self._jitted[with_mask]

    def predict_batch(
        self, speech: np.ndarray, sample_lengths: Optional[np.ndarray] = None
    ) -> List[str]:
        """speech: (B, L) normalised waveforms; sample_lengths: true lengths
        (defaults to L for all rows)."""
        speech = jnp.asarray(speech, jnp.float32)
        b, l = speech.shape
        if sample_lengths is None:
            sample_lengths = np.full((b,), l, np.int64)
        if self.use_attention_mask:
            mask = (np.arange(l)[None, :] < np.asarray(sample_lengths)[:, None]).astype(
                np.float32
            )
            preds, frame_lengths = self._step(True)(self.params, speech, jnp.asarray(mask))
        else:
            preds, frame_lengths = self._step(False)(self.params, speech)
            # drop frames produced purely by padding so the host-side collapse
            # sees only real audio frames
            frame_lengths = self.config.conv_output_length(
                np.asarray(sample_lengths, np.int64)
            )
        preds = np.asarray(preds)
        frame_lengths = np.asarray(frame_lengths)
        return [
            self.tokenizer.decode(preds[i, : frame_lengths[i]])
            for i in range(preds.shape[0])
        ]

    # -- the three evaluation modes --------------------------------------

    def transcribe_long(
        self,
        audio: np.ndarray,
        chunk_samples: int = 246000,
        context_samples: int = 16000,
    ) -> str:
        """Transcribe audio of ANY length by chunking with overlap.

        The reference truncates everything to `audio_maxlen`
        (`data_utils.py:75-78`) and pads eval inputs to one fixed shape —
        long-form audio is simply cut off.  Here the waveform is split into
        fixed-size windows that overlap by `context_samples` on each side;
        every window is one compiled shape, the frame predictions of each
        window's *center* region are kept (`plan_chunks`), and the greedy
        CTC collapse runs over the concatenated frame ids, so repeats across
        a boundary merge exactly like repeats inside a window.
        """
        audio = np.asarray(audio, np.float32)
        if len(audio) <= chunk_samples:
            return self.predict_batch(audio[None, :])[0]
        plan = plan_chunks(
            len(audio), chunk_samples, context_samples,
            self.config.conv_output_length,
        )
        ids: List[np.ndarray] = []
        for start, keep_lo, keep_hi in plan:
            chunk = audio[start : start + chunk_samples]
            true_len = len(chunk)
            if true_len < chunk_samples:
                chunk = np.pad(chunk, (0, chunk_samples - true_len))
            if self.use_attention_mask:
                mask = (np.arange(chunk_samples) < true_len).astype(np.float32)
                preds, _ = self._step(True)(
                    self.params, jnp.asarray(chunk[None, :]),
                    jnp.asarray(mask[None, :]),
                )
            else:
                preds, _ = self._step(False)(
                    self.params, jnp.asarray(chunk[None, :])
                )
            ids.append(np.asarray(preds)[0, keep_lo:keep_hi])
        return self.tokenizer.decode(np.concatenate(ids))

    def evaluate_padded(
        self,
        samples: Iterable[Tuple[np.ndarray, str]],
        batch_size: int = 8,
        pad_to: int = 246000,
    ) -> Tuple[float, int]:
        """Reference constant-pad mode (`main.py:48-51` shape).  Returns
        (wer, num_samples)."""
        refs, hyps = [], []
        batch, lengths, texts = [], [], []

        def flush():
            if not batch:
                return
            b = len(batch)
            speech = np.zeros((b, pad_to), np.float32)
            for i, s in enumerate(batch):
                speech[i, : len(s)] = s[:pad_to]
            hyps.extend(self.predict_batch(speech, np.minimum(lengths, pad_to)))
            refs.extend(texts)
            batch.clear()
            lengths.clear()
            texts.clear()

        for audio, text in samples:
            batch.append(audio)
            lengths.append(len(audio))
            texts.append(text)
            if len(batch) == batch_size:
                flush()
        flush()
        return wer(refs, hyps), len(refs)

    def evaluate_bucketed(
        self,
        samples: Iterable[Tuple[np.ndarray, str]],
        batch_size: int = 8,
        buckets: Optional[Sequence[int]] = None,
    ) -> Tuple[float, int]:
        """Bucketed mode: a handful of compiled shapes, minimal padding.

        This is the capability upgrade over the reference (see module
        docstring): no-padding-quality WER without eager fallback.
        """
        if buckets is None:
            buckets = default_buckets()
        buckets = sorted(buckets)
        pending = defaultdict(list)  # bucket -> [(audio, text)]
        refs, hyps = [], []

        def flush(bucket):
            entries = pending.pop(bucket, [])
            for start in range(0, len(entries), batch_size):
                chunk = entries[start : start + batch_size]
                speech = np.zeros((len(chunk), bucket), np.float32)
                lengths = np.zeros((len(chunk),), np.int64)
                for i, (audio, _) in enumerate(chunk):
                    speech[i, : len(audio)] = audio[:bucket]
                    lengths[i] = min(len(audio), bucket)
                hyps.extend(self.predict_batch(speech, lengths))
                refs.extend(t for _, t in chunk)

        for audio, text in samples:
            bucket = next((b for b in buckets if len(audio) <= b), buckets[-1])
            pending[bucket].append((audio, text))
            if len(pending[bucket]) == batch_size:
                flush(bucket)
        for bucket in list(pending):
            flush(bucket)
        return wer(refs, hyps), len(refs)
