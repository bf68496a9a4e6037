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
from .utils.metrics import wer, wer_details


def default_buckets(max_len: int = 400000, num: int = 8) -> List[int]:
    """Bucket boundaries in waveform samples, multiples of 16000 (1 s),
    biased toward typical LibriSpeech utterance lengths."""
    edges = np.linspace(max_len / num, max_len, num)
    return [int(np.ceil(e / 16000) * 16000) for e in edges]


def plan_chunks(
    total_len: int,
    chunk: int,
    context: int,
    conv_output_length,
    total_stride: Optional[int] = None,
):
    """Window plan for long-form transcription.

    Returns [(sample_start, keep_frame_lo, keep_frame_hi)] such that windows
    of `chunk` samples starting at `sample_start` cover the waveform, each
    overlapping its neighbours by ~`context` samples on both sides, and the
    kept frame ranges tile the audio EXACTLY: window starts are aligned to
    the conv stack's total stride (`total_stride` samples per output frame),
    so local frame `j` of a window starting at `s` is global frame
    `s // total_stride + j`, and junctions are computed once in global frame
    space — adjacent windows can neither overlap nor gap by a frame (they
    did when each junction was mapped through the nonlinear
    `conv_output_length` at sample granularity).  The final window's end
    still uses `conv_output_length` so pad-influenced tail frames are
    excluded, matching the unchunked decode.
    """
    if chunk <= 2 * context:
        raise ValueError(f"chunk {chunk} must exceed 2x context {context}")
    f = lambda n: int(conv_output_length(int(n)))
    if total_stride is None:
        # infer the frame period: f advances by exactly 1 every
        # `total_stride` samples, so over a span >> period the ratio rounds
        # to it exactly (floor effects contribute at most ±1 frame)
        span = max(chunk, 4096)
        count = f(2 * span) - f(span)
        if count <= 0:
            raise ValueError("conv_output_length produced no frames over a chunk")
        total_stride = max(1, round(span / count))
    stride = chunk - 2 * context
    plan = []
    start = 0  # center-region start (samples)
    prev_boundary = 0  # global frame index where the previous window stopped
    while start < total_len:
        win_start = max(0, start - context)
        win_start -= win_start % total_stride  # align to the frame grid
        base_frame = win_start // total_stride
        center_end = min(start + stride, total_len)
        keep_lo = prev_boundary - base_frame
        if center_end < total_len:
            keep_hi = min(center_end // total_stride - base_frame, f(chunk))
        else:
            keep_hi = f(min(total_len - win_start, chunk))
        if keep_hi > keep_lo:
            plan.append((win_start, keep_lo, keep_hi))
            prev_boundary = base_frame + keep_hi
        start = center_end
    return plan


class GreedyCTCEvaluator:
    """Greedy-decode WER evaluation for `Wav2Vec2ForCTC` parameters.

    Device side: forward + argmax, compiled once per (batch, length) shape.
    Host side: CTC collapse + string join (`Wav2Vec2Processor.decode`).

    `mesh`: an optional ("data", "model") `jax.sharding.Mesh`.  With one,
    the eval batch is sharded over the data axis so every chip of a slice
    works during WER eval (the reference — and round 2 here — evaluated on
    one device while 7/8 idled).  Multi-host: each process feeds its local
    slice of the batch, decodes its own rows, and the WER aggregates
    (errors, words) counts with one allgather at the end; `evaluate_padded`
    keeps hosts in lockstep through uneven shard tails with dummy batches.
    """

    def __init__(
        self,
        config: Wav2Vec2Config,
        params,
        *,
        compute_dtype=jnp.bfloat16,
        use_attention_mask: Optional[bool] = None,
        mesh=None,
        beam_width: int = 0,
        lm=None,
        lm_weight: float = 0.5,
        token_bonus: float = 0.0,
    ):
        self.config = config
        self.compute_dtype = compute_dtype
        self.tokenizer = Wav2Vec2Processor(is_tokenizer=True)
        self.use_attention_mask = (
            config.is_robust if use_attention_mask is None else use_attention_mask
        )
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        # Park the weights on device ONCE.  `jax.jit` copies numpy inputs
        # host->device on EVERY call, so host-resident params re-upload the
        # whole model per dispatch (~360 MB for base-95M) — invisible over
        # PCIe, but ~16 s per request over a tunneled chip (measured: the
        # serving daemon's per-request latency was flat ~16 s regardless
        # of payload size until this device_put; see COMPONENTS.md
        # §Serving).  Multi-process pods keep host params: every process
        # would need the same global replicated array, and pjit's per-call
        # transfer is correct there (pod serving feeds ~one batch per step,
        # not a latency-critical request loop).
        if jax.process_count() == 1:
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                params = jax.device_put(
                    params, NamedSharding(self.mesh, PartitionSpec())
                )
            else:
                params = jax.device_put(params)
        self.params = params
        # beam_width > 0: CTC prefix beam search over the summed alignment
        # mass instead of greedy argmax (`decoding.py` — an upgrade over
        # the reference's greedy-only decode, `processor.py:71-89`);
        # lm: optional `decoding.CharNGramLM` shallow fusion
        self.beam_width = beam_width
        self.lm = lm
        self.lm_weight = lm_weight
        self.token_bonus = token_bonus
        self._jitted = {}

    # -- mesh plumbing ----------------------------------------------------

    @property
    def _multiprocess(self) -> bool:
        return self.mesh is not None and jax.process_count() > 1

    def _row_quantum(self) -> int:
        """Local batch rows must pad to a multiple of this so the global
        batch divides the mesh's data axis."""
        if self.mesh is None:
            return 1
        import math

        from .parallel.mesh import DATA_AXIS

        data = self.mesh.shape[DATA_AXIS]
        return max(data // math.gcd(data, jax.process_count()), 1)

    @staticmethod
    def _local_rows(arr) -> np.ndarray:
        """This process's rows of a data-sharded global array, in the order
        this process contributed them."""
        if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
            shards = sorted(
                arr.addressable_shards,
                key=lambda s: s.index[0].start or 0,
            )
            return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
        return np.asarray(arr)

    def _lockstep(self, batch_iter, dummy_factory):
        """Yield (item, is_real); under multi-process SPMD, hosts whose
        shard ran dry keep feeding dummy batches (results discarded) until
        every host is done — a lone host skipping a collective would
        deadlock the pod."""
        if not self._multiprocess:
            for item in batch_iter:
                yield item, True
            return
        from jax.experimental import multihost_utils

        it = iter(batch_iter)
        while True:
            try:
                item, have = next(it), 1
            except StopIteration:
                item, have = None, 0
            flags = multihost_utils.process_allgather(np.asarray(have))
            if int(np.max(flags)) == 0:
                return
            yield (item if have else dummy_factory()), bool(have)

    def _aggregate_wer(self, refs, hyps) -> Tuple[float, int]:
        """Corpus WER over all hosts' shards: local (errors, words, n)
        counts, one allgather, exact global rate."""
        errors = words = 0
        for r, h in zip(refs, hyps):
            e, w = wer_details(r, h)
            errors += e
            words += w
        n = len(refs)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            counts = multihost_utils.process_allgather(
                np.asarray([errors, words, n], np.int64)
            )
            errors, words, n = (int(x) for x in counts.sum(axis=0))
        if words == 0:
            raise ValueError("empty reference corpus")
        return errors / words, n

    def _step(self, with_mask: bool, mode: Optional[str] = None):
        """Compiled forward step.  `mode`:
          * "argmax"   — per-frame argmax ids (greedy decode),
          * "logprobs" — full per-frame log-softmax (beam search),
          * "scored"   — argmax ids PLUS each frame's max log-prob
            (greedy decode with word timestamps/confidences).
        Default follows `beam_width` as before."""
        if mode is None:
            mode = "logprobs" if self.beam_width > 0 else "argmax"
        key = (with_mask, mode)
        if key not in self._jitted:
            config, cdtype = self.config, self.compute_dtype

            def fn(params, speech, mask=None):
                logits = wav2vec2_for_ctc_forward(
                    params, config, speech, mask, training=False,
                    compute_dtype=cdtype,
                )
                if mode == "logprobs":
                    out = jax.nn.log_softmax(logits, axis=-1)
                elif mode == "scored":
                    logp = jax.nn.log_softmax(logits, axis=-1)
                    out = (
                        jnp.argmax(logits, axis=-1).astype(jnp.int32),
                        jnp.max(logp, axis=-1).astype(jnp.float32),
                    )
                else:
                    out = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                if mask is not None:
                    lengths = config.conv_output_length(
                        jnp.sum(mask.astype(jnp.int32), axis=-1)
                    ).astype(jnp.int32)
                else:
                    lengths = jnp.full(
                        (logits.shape[0],), logits.shape[1], jnp.int32
                    )
                return out, lengths

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def _pad_rows(self, speech: np.ndarray, sample_lengths):
        """Pad (speech, lengths) rows up to the data-axis quantum so the
        global batch divides the mesh; returns (speech, lengths)."""
        b, l = speech.shape
        pad_rows = (-b) % self._row_quantum()
        if pad_rows:
            speech = np.concatenate(
                [speech, np.zeros((pad_rows, l), np.float32)], axis=0
            )
            sample_lengths = np.concatenate(
                [sample_lengths, np.full((pad_rows,), l, np.int64)]
            )
        return speech, sample_lengths

    def _device_outputs(self, speech, sample_lengths, mode=None):
        """Run the compiled step over rows already padded to the data-axis
        quantum, mesh-sharded when a mesh is set.  Returns host numpy
        `(outs, frame_lengths)`; `outs` is a tuple of per-frame arrays for
        mode="scored", a single array otherwise.  `frame_lengths` is
        clipped to [0, frames] (conv_output_length goes NEGATIVE below
        ~25 samples on the 7-layer stack — each layer floors — and
        filler/dummy rows use tiny lengths; a negative slice bound would
        silently decode almost a full row)."""
        l = speech.shape[1]
        inputs = {"speech": speech}
        if self.use_attention_mask:
            inputs["mask"] = (
                np.arange(l)[None, :] < sample_lengths[:, None]
            ).astype(np.float32)
        if self.mesh is not None:
            from .parallel import multihost

            gb = multihost.host_local_batch_to_global(inputs, self.mesh)
            args = [gb[k] for k in inputs]
            to_host = self._local_rows
        else:
            args = [jnp.asarray(v) for v in inputs.values()]
            to_host = np.asarray
        outs, frame_lengths = self._step(self.use_attention_mask, mode)(
            self.params, *args
        )
        if isinstance(outs, tuple):
            outs = tuple(to_host(o) for o in outs)
            frames = outs[0].shape[1]
        else:
            outs = to_host(outs)
            frames = outs.shape[1]
        if self.use_attention_mask:
            frame_lengths = to_host(frame_lengths)
        else:
            # drop frames produced purely by padding so the host-side
            # collapse sees only real audio frames
            frame_lengths = self.config.conv_output_length(sample_lengths)
        frame_lengths = np.clip(np.asarray(frame_lengths), 0, frames)
        return outs, frame_lengths

    def predict_batch(
        self, speech: np.ndarray, sample_lengths: Optional[np.ndarray] = None
    ) -> List[str]:
        """speech: (B, L) normalised waveforms; sample_lengths: true lengths
        (defaults to L for all rows).  With a mesh, rows are padded up to
        the data-axis quantum, the batch runs sharded over all devices, and
        only this process's real rows are decoded."""
        speech = np.asarray(speech, np.float32)
        b, l = speech.shape
        if sample_lengths is None:
            sample_lengths = np.full((b,), l, np.int64)
        sample_lengths = np.asarray(sample_lengths, np.int64)
        speech, sample_lengths = self._pad_rows(speech, sample_lengths)
        preds, frame_lengths = self._device_outputs(speech, sample_lengths)
        if self.beam_width > 0:
            from .decoding import ctc_beam_decode_batch

            seqs = ctc_beam_decode_batch(
                preds[:b], frame_lengths[:b], self.beam_width,
                self.config.pad_id, lm=self.lm, lm_weight=self.lm_weight,
                token_bonus=self.token_bonus,
            )
            return [
                self.tokenizer.decode(
                    np.asarray(s, np.int32), group_tokens=False
                )
                for s in seqs
            ]
        return [
            self.tokenizer.decode(preds[i, : frame_lengths[i]])
            for i in range(b)  # pad rows (if any) fall off here
        ]

    @property
    def frame_seconds(self) -> float:
        """Wall-clock seconds per encoder frame: the conv stack's total
        stride over the 16 kHz sample rate (20 ms for the standard
        [5,2,2,2,2,2,2] strides)."""
        return float(np.prod(self.config.strides)) / 16000.0

    def predict_segments(
        self, speech: np.ndarray, sample_lengths: Optional[np.ndarray] = None
    ):
        """Greedy decode with word-level timestamps and confidences.

        Returns one `(text, words)` pair per input row, where `words` is
        `decoding.ctc_word_segments` output: dicts with the word string,
        start/end in seconds (and frames), and the mean per-frame
        probability of the argmax characters as a confidence.  The word
        timing convention matches HuggingFace's
        `Wav2Vec2CTCTokenizer.decode(..., output_word_offsets=True)`
        (oracle-tested).  Beam search has no frame alignment, so this
        surface is greedy-only."""
        if self.beam_width > 0:
            raise ValueError(
                "word timestamps require greedy decoding (beam_width=0): "
                "beam search sums over alignments and keeps no frame path"
            )
        from .decoding import ctc_word_segments

        speech = np.asarray(speech, np.float32)
        b, l = speech.shape
        if sample_lengths is None:
            sample_lengths = np.full((b,), l, np.int64)
        sample_lengths = np.asarray(sample_lengths, np.int64)
        speech, sample_lengths = self._pad_rows(speech, sample_lengths)
        (ids, maxlogp), frame_lengths = self._device_outputs(
            speech, sample_lengths, mode="scored"
        )
        return [
            ctc_word_segments(
                ids[i, : frame_lengths[i]],
                frame_probs=np.exp(maxlogp[i, : frame_lengths[i]]),
                pad_id=self.config.pad_id,
                delimiter_id=self.tokenizer.delimiter_id,
                id_to_token=self.tokenizer.id_to_token_mapping,
                frame_seconds=self.frame_seconds,
            )
            for i in range(b)
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
            total_stride=int(np.prod(self.config.strides)),
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
        if self.beam_width > 0:
            # beam mode: the step returned per-frame LOG-PROBS, not ids —
            # concatenate the kept slices and run ONE prefix beam search
            # over the whole utterance (strictly better than per-chunk
            # decoding: mass sums across chunk boundaries; host cost is
            # O(frames x beam x vocab))
            from .decoding import ctc_prefix_beam_search

            seq = ctc_prefix_beam_search(
                np.concatenate(ids, axis=0), self.beam_width,
                self.config.pad_id, lm=self.lm, lm_weight=self.lm_weight,
                token_bonus=self.token_bonus,
            )
            return self.tokenizer.decode(
                np.asarray(seq, np.int32), group_tokens=False
            )
        return self.tokenizer.decode(np.concatenate(ids))

    def transcribe_long_segments(
        self,
        audio: np.ndarray,
        chunk_samples: int = 246000,
        context_samples: int = 16000,
    ):
        """Long-form `predict_segments`: word timestamps over audio of ANY
        length.  Windows follow the same `plan_chunks` tiling as
        `transcribe_long`; kept frame ranges tile the utterance exactly
        from frame 0, so the concatenated stream's indices ARE global frame
        indices and word times stay correct across chunk junctions."""
        if self.beam_width > 0:
            raise ValueError(
                "word timestamps require greedy decoding (beam_width=0): "
                "beam search sums over alignments and keeps no frame path"
            )
        from .decoding import ctc_word_segments

        audio = np.asarray(audio, np.float32)
        if len(audio) <= chunk_samples:
            return self.predict_segments(audio[None, :])[0]
        plan = plan_chunks(
            len(audio), chunk_samples, context_samples,
            self.config.conv_output_length,
            total_stride=int(np.prod(self.config.strides)),
        )
        ids: List[np.ndarray] = []
        probs: List[np.ndarray] = []
        for start, keep_lo, keep_hi in plan:
            chunk = audio[start : start + chunk_samples]
            true_len = len(chunk)
            if true_len < chunk_samples:
                chunk = np.pad(chunk, (0, chunk_samples - true_len))
            speech, lengths = self._pad_rows(
                chunk[None, :], np.asarray([true_len], np.int64)
            )
            (win_ids, win_logp), _ = self._device_outputs(
                speech, lengths, mode="scored"
            )
            ids.append(win_ids[0, keep_lo:keep_hi])
            probs.append(np.exp(win_logp[0, keep_lo:keep_hi]))
        return ctc_word_segments(
            np.concatenate(ids),
            frame_probs=np.concatenate(probs),
            pad_id=self.config.pad_id,
            delimiter_id=self.tokenizer.delimiter_id,
            id_to_token=self.tokenizer.id_to_token_mapping,
            frame_seconds=self.frame_seconds,
        )

    def align_segments(
        self,
        audio: np.ndarray,
        transcript: str,
        chunk_samples: int = 246000,
        context_samples: int = 16000,
        pad_to: Optional[int] = None,
    ):
        """Forced alignment: word timestamps for a KNOWN transcript.

        Where `predict_segments` times whatever the model transcribes,
        this times the words the caller asserts were said — the standard
        wav2vec2 alignment use (subtitles, karaoke, corpus segmentation;
        no reference analog).  The per-frame log-softmax is computed on
        device (long audio via the same `plan_chunks` tiling as
        `transcribe_long`, so frame indices are global), then
        `decoding.ctc_forced_align` finds the max-probability CTC path
        that collapses to the transcript, and the word segmentation +
        timing conventions are shared with `predict_segments` (the path
        IS a greedy-style frame path by construction).

        Returns `(text, words)`: `text` is the normalised transcript the
        alignment used; `words` carry start/end seconds, frames, and a
        per-word confidence (mean per-frame probability of the aligned
        characters).  Raises ValueError if the transcript has more
        symbols than the audio has frames to emit them.

        `pad_to`: optional single-window pad length — the device program
        then runs at that fixed shape (a server aligns at its bucket
        shapes instead of compiling per request length); padding frames
        are sliced off before the trellis.  For mask-aware (robust)
        models the result is bit-identical to the unpadded call; for the
        base family the conv stack's time-axis GroupNorm sees the padding
        (the same padding sensitivity as the reference's fixed-pad eval,
        `assets/final_report.md:55-58`), so near-tie boundaries can move
        by a frame — consistent with the serving daemon's padded
        transcribe path.
        """
        from .decoding import ctc_forced_align, ctc_word_segments

        label_ids = self.tokenizer(" ".join(transcript.split()))
        audio = np.asarray(audio, np.float32)
        if audio.ndim != 1:
            raise ValueError(f"align_segments takes one utterance, got {audio.shape}")

        logp: List[np.ndarray] = []
        if len(audio) <= chunk_samples:
            true_len = len(audio)
            padded = audio
            if pad_to is not None and pad_to > true_len:
                padded = np.pad(audio, (0, pad_to - true_len))
            speech, lengths = self._pad_rows(
                padded[None, :], np.asarray([true_len], np.int64)
            )
            out, frame_lengths = self._device_outputs(
                speech, lengths, mode="logprobs"
            )
            logp.append(out[0, : frame_lengths[0]])
        else:
            plan = plan_chunks(
                len(audio), chunk_samples, context_samples,
                self.config.conv_output_length,
                total_stride=int(np.prod(self.config.strides)),
            )
            for start, keep_lo, keep_hi in plan:
                chunk = audio[start : start + chunk_samples]
                true_len = len(chunk)
                if true_len < chunk_samples:
                    chunk = np.pad(chunk, (0, chunk_samples - true_len))
                speech, lengths = self._pad_rows(
                    chunk[None, :], np.asarray([true_len], np.int64)
                )
                out, _ = self._device_outputs(speech, lengths, mode="logprobs")
                logp.append(out[0, keep_lo:keep_hi])
        log_probs = np.concatenate(logp, axis=0)

        path, _ = ctc_forced_align(
            log_probs, label_ids, blank_id=self.config.pad_id
        )
        frame_probs = np.exp(
            log_probs[np.arange(len(path)), path].astype(np.float64)
        )
        return ctc_word_segments(
            path,
            frame_probs=frame_probs,
            pad_id=self.config.pad_id,
            delimiter_id=self.tokenizer.delimiter_id,
            id_to_token=self.tokenizer.id_to_token_mapping,
            frame_seconds=self.frame_seconds,
        )

    def evaluate_padded(
        self,
        samples: Iterable[Tuple[np.ndarray, str]],
        batch_size: int = 8,
        pad_to: int = 246000,
    ) -> Tuple[float, int]:
        """Reference constant-pad mode (`main.py:48-51` shape).  Returns
        (wer, num_samples) — the GLOBAL corpus numbers under multi-host.

        Multi-process SPMD needs every host to present the same local batch
        shape each step, so here every flush (including the shard tail and
        the lockstep dummies) is padded to exactly `batch_size` rows.
        """

        def batches():
            batch, lengths, texts = [], [], []
            for audio, text in samples:
                batch.append(audio)
                lengths.append(len(audio))
                texts.append(text)
                if len(batch) == batch_size:
                    yield batch, lengths, texts
                    batch, lengths, texts = [], [], []
            if batch:
                yield batch, lengths, texts

        def dummy():
            return [np.zeros(16, np.float32)], [16], [""]

        refs, hyps = [], []
        fixed_rows = batch_size if self._multiprocess else None
        for (batch, lengths, texts), real in self._lockstep(batches(), dummy):
            rows = fixed_rows or len(batch)
            speech = np.zeros((rows, pad_to), np.float32)
            # filler rows get length 0 (shapes — all SPMD needs — stay
            # identical): they then decode zero frames instead of paying a
            # full-length host-side decode whose output is dropped anyway
            # (with beam search that is ~768 frames x beams x vocab each)
            row_lengths = np.zeros((rows,), np.int64)
            for i, s in enumerate(batch):
                speech[i, : min(len(s), pad_to)] = s[:pad_to]
                row_lengths[i] = min(lengths[i], pad_to)
            out = self.predict_batch(speech, row_lengths)
            if real:
                hyps.extend(out[: len(batch)])
                refs.extend(texts)
        return self._aggregate_wer(refs, hyps)

    def evaluate_bucketed(
        self,
        samples: Iterable[Tuple[np.ndarray, str]],
        batch_size: int = 8,
        buckets: Optional[Sequence[int]] = None,
    ) -> Tuple[float, int]:
        """Bucketed mode: a handful of compiled shapes, minimal padding.

        This is the capability upgrade over the reference (see module
        docstring): no-padding-quality WER without eager fallback.

        Multi-host pods: each host flushes its OWN buckets, but every flush
        runs at a consensus shape — one tiny allgather exchanges
        ``(have_flush, bucket)`` per step, all hosts pad rows to
        ``batch_size`` and audio to the max bucket (dummy/filler rows carry
        length 0 and decode zero frames), and hosts that ran dry keep
        feeding empty flushes until all are done.  The compiled-shape count
        stays bounded by the bucket set, and pods are no longer forced into
        `evaluate_padded`'s whole-corpus pad (whose WER cost this mode
        exists to eliminate).  Note the base-family caveat
        (`docs/MIGRATING.md`): consensus re-padding can move near-tie
        decodes by a frame exactly like any padded batch.
        """
        if buckets is None:
            buckets = default_buckets()
        buckets = sorted(buckets)
        pending = defaultdict(list)  # bucket -> [(audio, text)]
        refs, hyps = [], []

        def flush(entries, bucket, fixed_rows: Optional[int]):
            rows = fixed_rows or len(entries)
            speech = np.zeros((rows, bucket), np.float32)
            lengths = np.zeros((rows,), np.int64)
            for i, (audio, _) in enumerate(entries):
                speech[i, : min(len(audio), bucket)] = audio[:bucket]
                lengths[i] = min(len(audio), bucket)
            out = self.predict_batch(speech, lengths)
            hyps.extend(out[: len(entries)])
            refs.extend(t for _, t in entries)

        def flushes():
            """Yield (entries, bucket) units: full batches as pools fill,
            then the per-bucket tails in deterministic (sorted) order."""
            for audio, text in samples:
                bucket = next(
                    (b for b in buckets if len(audio) <= b), buckets[-1]
                )
                pending[bucket].append((audio, text))
                if len(pending[bucket]) == batch_size:
                    yield pending.pop(bucket), bucket
            for bucket in sorted(pending):
                entries = pending.pop(bucket)
                for start in range(0, len(entries), batch_size):
                    yield entries[start : start + batch_size], bucket

        if not self._multiprocess:
            for entries, bucket in flushes():
                flush(entries, bucket, None)
            return wer(refs, hyps), len(refs)

        from jax.experimental import multihost_utils

        it = flushes()
        while True:
            try:
                entries, bucket = next(it)
                have = 1
            except StopIteration:
                entries, bucket, have = [], 0, 0
            info = multihost_utils.process_allgather(
                np.asarray([have, bucket], np.int64)
            )
            if int(np.max(info[:, 0])) == 0:
                break
            # consensus shape: every host presents (batch_size, max bucket)
            flush(entries, int(np.max(info[:, 1])), batch_size)
        return self._aggregate_wer(refs, hyps)
