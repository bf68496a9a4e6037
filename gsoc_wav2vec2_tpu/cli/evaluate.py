"""CLI: WER evaluation of a checkpoint on LibriSpeech-style data.

Replaces the reference's two evaluation notebooks
(`librispeech_evaluation_WER_3.ipynb` — variable length, eager, batch 1 —
and `WER_6.ipynb` — constant pad 246000 under jit) with one jitted harness
offering three modes: `padded` (the reference's fast path), `bucketed`
(few compiled shapes, minimal padding — recovers no-padding accuracy), and
`single` (batch-1 per sample, the reference WER_3 mode).  By default
`single` rounds each length up to the next `--round_to` samples (≤0.1 s of
padding) to bound XLA compiles; for base-family models (no attention mask)
that padding does enter attention, so pass `--round_to 1` to reproduce the
reference's bit-exact no-padding numbers (at one compile per distinct
length).

Usage:
    python -m gsoc_wav2vec2_tpu.cli.evaluate --model_dir <dir> \
        --data_dir LibriSpeech/test-clean --mode bucketed
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from ..data.loaders import LibriSpeechDataLoader, LibriSpeechDataLoaderArgs
from ..evaluation import GreedyCTCEvaluator
from ..models.modeling import Wav2Vec2ForCTC
from ..utils.metrics import wer


def _samples(loader: LibriSpeechDataLoader):
    """(waveform, reference text) pairs from either source: raw corpora or
    the same tfrecord shards training consumes (labels are stored
    tokenised; `group_tokens=False` reverses the tokenizer exactly)."""
    it = (
        loader._tfrecord_samples(loader.tfrecords)
        if loader.from_tfrecords
        else loader._raw_samples()
    )
    for speech, label in it:
        yield speech, loader.tokenizer.decode(label, group_tokens=False)


def main() -> None:
    parser = argparse.ArgumentParser("Greedy-CTC WER evaluation")
    parser.add_argument("--model_dir", required=True, type=str)
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument(
        "--tfrecords", nargs="*", default=[],
        help="evaluate the tfrecord shards training consumes instead of a "
             "raw corpus dir (glob patterns; local or gs://)",
    )
    parser.add_argument("--mode", choices=["padded", "bucketed", "single"],
                        default="bucketed")
    parser.add_argument(
        "--sharded", action="store_true",
        help="shard eval batches over ALL devices (data-parallel mesh) "
             "instead of evaluating on one chip",
    )
    parser.add_argument(
        "--beam_width", type=int, default=0,
        help="CTC prefix beam search width (0 = greedy, the reference's "
             "decode); sums alignment mass per transcription instead of "
             "taking the best frame path",
    )
    parser.add_argument(
        "--lm_path", type=str, default=None,
        help="CharNGramLM JSON for shallow fusion (see --lm_fit_dir); "
             "requires --beam_width > 0",
    )
    parser.add_argument(
        "--lm_fit_dir", type=str, default=None,
        help="fit a char n-gram LM on this corpus's *.trans.txt transcripts "
             "(saved next to --lm_path if given, else used in-memory)",
    )
    parser.add_argument("--lm_order", type=int, default=4)
    # None sentinels: both knobs only act inside the LM-fusion decode, so
    # passing them without an LM is an error, not a silent no-op
    parser.add_argument("--lm_weight", type=float, default=None,
                        help="fusion weight (default 0.5; requires an LM)")
    parser.add_argument("--token_bonus", type=float, default=None,
                        help="per-token insertion bonus under LM fusion "
                             "(requires an LM)")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--pad_to", type=int, default=246000)
    parser.add_argument("--limit", type=int, default=0, help="cap sample count")
    parser.add_argument(
        "--round_to", type=int, default=1600,
        help="single mode: round lengths up to this multiple (samples) to "
             "bound XLA compiles — test-clean has ~2600 distinct lengths; "
             "1600 ≈ 0.1 s of padding caps it at ~220 shapes. NOTE: for "
             "base models (no attention mask) the padding perturbs "
             "attention slightly; use 1 for the bit-exact no-padding "
             "reference mode (decode-side frame truncation applies either "
             "way)",
    )
    args = parser.parse_args()

    if bool(args.data_dir) == bool(args.tfrecords):
        parser.error("pass exactly one of --data_dir / --tfrecords")

    model = Wav2Vec2ForCTC.from_pretrained(args.model_dir)
    mesh = None
    if args.sharded:
        import jax

        from ..parallel import make_mesh, multihost

        multihost.initialize()
        mesh = make_mesh(model=1)  # every device on the data axis
        print(f"sharded eval over {jax.device_count()} devices")
    lm = None
    if args.lm_fit_dir:
        from ..decoding import CharNGramLM

        lm = CharNGramLM.fit_from_librispeech(args.lm_fit_dir, args.lm_order)
        if args.lm_path:
            lm.save(args.lm_path)
    elif args.lm_path:
        from ..decoding import CharNGramLM

        lm = CharNGramLM.load(args.lm_path)
    if lm is not None and args.beam_width <= 0:
        parser.error("--lm_path/--lm_fit_dir require --beam_width > 0")
    if lm is None and (args.lm_weight is not None or args.token_bonus is not None):
        parser.error(
            "--lm_weight/--token_bonus only act with --lm_path/--lm_fit_dir"
        )
    evaluator = GreedyCTCEvaluator(
        model.config, model.params, mesh=mesh, beam_width=args.beam_width,
        lm=lm,
        lm_weight=0.5 if args.lm_weight is None else args.lm_weight,
        token_bonus=0.0 if args.token_bonus is None else args.token_bonus,
    )
    # multi-host: each process reads only its corpus slice — the evaluator
    # aggregates (errors, words, n) globally, so feeding every host the
    # whole corpus would P-fold both the work and num_samples
    import jax as _jax

    shard = dict(
        shard_index=_jax.process_index(), shard_count=_jax.process_count()
    )
    if args.tfrecords:
        from ..data.remote import expand_patterns

        loader = LibriSpeechDataLoader(
            LibriSpeechDataLoaderArgs(
                from_tfrecords=True, tfrecords=expand_patterns(args.tfrecords)
            ),
            **shard,
        )
    else:
        loader = LibriSpeechDataLoader(
            LibriSpeechDataLoaderArgs(data_dir=args.data_dir), **shard
        )

    def sample_iter():
        for i, item in enumerate(_samples(loader)):
            if args.limit and i >= args.limit:
                return
            yield item

    start = time.time()
    if args.mode == "padded":
        score, n = evaluator.evaluate_padded(
            sample_iter(), batch_size=args.batch_size, pad_to=args.pad_to
        )
    elif args.mode == "bucketed":
        score, n = evaluator.evaluate_bucketed(
            sample_iter(), batch_size=args.batch_size
        )
    else:  # single: the reference's batch-1 no-padding mode (WER_3 notebook)
        if args.round_to > 1 and not model.config.is_robust:
            import sys

            print(
                f"note: --round_to {args.round_to} pads inputs and this "
                "base-family model takes no attention mask, so padding "
                "perturbs attention slightly; pass --round_to 1 for the "
                "reference's bit-exact no-padding WER",
                file=sys.stderr,
            )
        refs, hyps = [], []
        for audio, text in sample_iter():
            true_len = len(audio)
            if args.round_to > 1:
                padded = -(-true_len // args.round_to) * args.round_to
                audio = np.pad(audio, (0, padded - true_len))
            hyps.extend(
                evaluator.predict_batch(
                    audio[None, :], np.asarray([true_len], np.int64)
                )
            )
            refs.append(text)
        score, n = wer(refs, hyps), len(refs)
    elapsed = time.time() - start

    report = {
        "wer": round(score, 5),
        "num_samples": n,
        "mode": args.mode,
        "seconds": round(elapsed, 2),
    }
    if args.mode == "single":
        report["round_to"] = args.round_to
    if args.beam_width:
        report["beam_width"] = args.beam_width
    if lm is not None:
        report["lm"] = {"order": lm.order, "weight": args.lm_weight,
                        "token_bonus": args.token_bonus}
    print(json.dumps(report))


if __name__ == "__main__":
    main()
