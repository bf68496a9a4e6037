"""Self-supervised pretraining driver (contrastive + diversity objective).

BEYOND the reference: thevasudevgupta/gsoc-wav2vec2 starts every recipe from
an already-pretrained checkpoint (`src/main.py` fine-tunes only); this
driver trains that checkpoint itself — the wav2vec2 paper's masked
contrastive objective (arXiv:2006.11477) over unlabeled audio — and exports
a backbone `cli.train` can fine-tune, closing the model lifecycle on TPU.

Schedule defaults follow the HF/fairseq pretraining recipe: AdamW with
linear warmup → linear decay, Gumbel temperature annealed
`max * decay^step` down to `min`.  Both schedules are traced (the LR inside
the optimizer, the temperature as a step argument), so they never
recompile the step.

Usage:
    python -m gsoc_wav2vec2_tpu.cli.pretrain --train_dir ... --epochs 1
(labels in the corpus are ignored; only audio is read.)
"""

from __future__ import annotations

import argparse
import os
import time
from dataclasses import asdict, dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.loaders import LibriSpeechDataLoader, LibriSpeechDataLoaderArgs
from ..models.config import Wav2Vec2PretrainingConfig
from ..models.pretraining import (
    ctc_params_from_pretraining,
    init_wav2vec2_for_pretraining_params,
    make_pretrain_accum_steps,
    make_pretrain_step,
)
from ..ops.specaugment import compute_mask_indices
from ..parallel import make_mesh, multihost, replicated, shard_params
from ..training import CheckpointManager, TrainState
from ..utils.logging import MetricLogger
from .train import (
    _CKPT_STRIDE,
    PreemptExit,
    _preempt_consensus,
    install_preempt_handler,
)


@dataclass
class PretrainingArgs:
    epochs: int = 1
    lr: float = 5e-4
    warmup_steps: int = 32000
    weight_decay: float = 0.01
    adam_eps: float = 1e-6

    # Gumbel temperature anneal (HF run_wav2vec2_pretraining_no_trainer.py
    # defaults: 2 → 0.5, multiplicative decay per step)
    gumbel_temp_max: float = 2.0
    gumbel_temp_min: float = 0.5
    gumbel_temp_decay: float = 0.999995

    # pretraining masks aggressively (paper §4.2: p=0.065 per-start ≈ 49%
    # of frames; the HF config expresses it as mask_time_prob=0.65 spans)
    mask_time_prob: float = 0.65
    mask_time_length: int = 10

    batch_size_per_device: int = 8
    # microbatches summed per optimizer update: wav2vec2 pretraining needs
    # large effective batches (the paper's base recipe spans 64 GPUs);
    # accumulation reaches that on any mesh size
    grad_accum: int = 1
    # EMA shadow weights (0 = off) — same semantics as cli.train: the
    # exported fine-tune-ready backbone gets a `for_ctc_ema/` sibling
    ema_decay: float = 0.0
    audio_maxlen: int = 246000
    # LR-decay horizon override; 0 = epochs x steps-per-epoch when the
    # loader can count its stream, else the paper recipe's 500k steps
    total_steps: int = 0
    seed: int = 0
    logging_steps: int = 16
    ckpt_every_epochs: int = 1
    # multi-host preemption-flag consensus cadence (see cli.train)
    preempt_sync_updates: int = 25

    model_axis: int = 1
    compute_dtype: str = "bfloat16"
    remat: bool = True
    remat_policy: str = "dots"

    train_tfrecords: List[str] = field(default_factory=list)
    train_dir: Optional[str] = None
    # path to a config.json (Wav2Vec2PretrainingConfig fields); default =
    # the base-geometry pretraining config
    config: Optional[str] = None
    ckpt_dir: str = "pretrain_checkpoints"
    log_dir: str = "logs"
    wandb_project: Optional[str] = None
    resume: Optional[str] = None

    def __post_init__(self):
        bucket = os.environ.get("DATA_BUCKET_NAME")
        if bucket and not (self.train_tfrecords or self.train_dir):
            self.train_tfrecords = [os.path.join(bucket, "train", "*.tfrecord")]
        dummy = os.environ.get("DUMMY_DATA_PATH")
        if dummy and not (self.train_tfrecords or self.train_dir):
            self.train_dir = dummy
        ckpt_bucket = os.environ.get("CKPT_BUCKET_NAME")
        if ckpt_bucket:
            self.ckpt_dir = ckpt_bucket
        from ..data.remote import expand_patterns

        self.train_tfrecords = expand_patterns(self.train_tfrecords)


def _global_batch(args: PretrainingArgs) -> int:
    return args.batch_size_per_device * max(
        jax.device_count() // args.model_axis, 1
    )


def gumbel_temperature(args: PretrainingArgs, step: int) -> float:
    return max(
        args.gumbel_temp_max * args.gumbel_temp_decay**step,
        args.gumbel_temp_min,
    )


def main(args: PretrainingArgs, config: Optional[Wav2Vec2PretrainingConfig] = None):
    multihost.initialize()
    mesh = make_mesh(model=args.model_axis)
    if config is None:
        config = (
            Wav2Vec2PretrainingConfig.from_json(args.config)
            if args.config else Wav2Vec2PretrainingConfig()
        )
    global_batch = _global_batch(args)
    if global_batch % jax.process_count() != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{jax.process_count()} processes"
        )

    loader = LibriSpeechDataLoader(
        LibriSpeechDataLoaderArgs(
            from_tfrecords=bool(args.train_tfrecords),
            tfrecords=args.train_tfrecords or None,
            data_dir=args.train_dir,
            batch_size=global_batch // jax.process_count(),
            audio_maxlen=args.audio_maxlen,
        ),
        shard_index=jax.process_index(),
        shard_count=jax.process_count(),
    )
    # per-host shards can differ by one batch; the schedule horizon below is
    # baked into every host's jitted step, so it must be the GLOBAL minimum
    # (lockstep_batches drains exactly that many)
    steps_per_epoch = multihost.sync_min_count(
        loader.num_batches(drop_remainder=True)
    )
    if args.grad_accum < 1:
        raise ValueError(f"--grad_accum must be >= 1, got {args.grad_accum}")
    accum = args.grad_accum
    if args.total_steps > 0:
        total_steps = args.total_steps
    elif steps_per_epoch is not None:
        # the LR schedule is indexed by optimizer updates, of which each
        # epoch has floor(batches / accumulation)
        total_steps = max(steps_per_epoch // accum * args.epochs, 1)
    else:
        # tfrecord streams cannot be counted without a full scan; decay
        # over the wav2vec2-base recipe's 500k-step horizon instead
        total_steps = 500_000
        print(
            "tfrecord stream length unknown: LR decays over 500000 steps "
            "(--total_steps overrides)"
        )

    params = init_wav2vec2_for_pretraining_params(
        jax.random.PRNGKey(args.seed), config
    )
    # LR schedule lives INSIDE the optimizer (step-indexed, traced): linear
    # warmup to args.lr then linear decay to zero — zero host work per step
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.0, args.lr, max(args.warmup_steps, 1)),
            optax.linear_schedule(
                args.lr, 0.0, max(total_steps - args.warmup_steps, 1)
            ),
        ],
        [max(args.warmup_steps, 1)],
    )
    tx = optax.adamw(schedule, weight_decay=args.weight_decay, eps=args.adam_eps)

    params = shard_params(params, mesh)
    repl = replicated(mesh)
    # pin every optimizer leaf that is not already mesh-wide (scalar step
    # counters etc. come out of init committed to one device) — same
    # treatment as cli.train's run_stage, and required for the same reason:
    # the jitted step must see one consistent device set, and Orbax restore
    # commits to exactly these shardings
    mesh_devices = set(np.asarray(mesh.devices).flat)

    def _mesh_wide(x):
        s = getattr(x, "sharding", None)
        if s is not None and getattr(s, "device_set", None) == mesh_devices:
            return x
        if hasattr(x, "shape"):
            return jax.device_put(x, repl)
        return x

    if not 0.0 <= args.ema_decay < 1.0:
        raise ValueError(f"--ema_decay must be in [0, 1), got {args.ema_decay}")
    state = TrainState(
        step=jax.device_put(jnp.zeros((), jnp.int32), repl),
        params=params,
        opt_state=jax.tree.map(_mesh_wide, jax.jit(tx.init)(params)),
        ema_params=(
            jax.jit(lambda t: jax.tree.map(jnp.copy, t))(params)
            if args.ema_decay > 0 else None
        ),
    )
    if args.resume is not None:
        # continue inside the previous run's checkpoint dir (same contract
        # as cli.train --resume)
        args.ckpt_dir = args.resume
    ckpt = CheckpointManager(os.path.join(args.ckpt_dir, "pretrain"))
    start_epoch = 0
    skip_updates = 0
    if args.resume is not None:
        last = ckpt.latest_step()
        if last is None:
            raise ValueError(
                f"--resume {args.resume}: no checkpoint found under "
                f"{os.path.join(args.ckpt_dir, 'pretrain')} — refusing to "
                "silently restart from scratch"
            )
        state = ckpt.restore(state)
        start_epoch = int(last) // _CKPT_STRIDE
        skip_updates = int(last) % _CKPT_STRIDE
        at = f" (+{skip_updates} updates)" if skip_updates else ""
        print(f"pretrain: resumed epoch {start_epoch}{at} from {args.resume}")

    step_kwargs = dict(
        division_factor=global_batch * accum,  # SUM over the effective batch
        with_attention_mask=True,
        compute_dtype=getattr(jnp, args.compute_dtype),
        remat=(args.remat_policy if args.remat_policy != "full" else True)
        if args.remat else False,
        mesh=mesh,
        ema_decay=args.ema_decay if args.ema_decay > 0 else None,
    )
    if accum == 1:
        step_fn = make_pretrain_step(config, tx, **step_kwargs)
    else:
        init_fn, accum_fn, apply_fn = make_pretrain_accum_steps(
            config, tx, **step_kwargs
        )
    frames = int(config.conv_output_length(args.audio_maxlen))

    @jax.jit
    def batch_masks(rng, attention_mask):
        # mask-span starts restricted to REAL frames: padded frames must
        # never become contrastive targets/negatives (a typical utterance
        # padded to audio_maxlen is 20-70% padding)
        frame_length = config.conv_output_length(
            jnp.sum(attention_mask.astype(jnp.int32), axis=-1)
        )
        mask = compute_mask_indices(
            rng, global_batch, frames, args.mask_time_prob,
            args.mask_time_length,
        )
        valid = jnp.arange(frames)[None, :] < frame_length[:, None]
        return mask & valid

    rng = jax.device_put(jax.random.PRNGKey(args.seed + 1), repl)
    logger = MetricLogger(args.log_dir, project=args.wandb_project,
                          config=asdict(args))
    step_count = int(jax.device_get(state.step))
    install_preempt_handler()  # SIGTERM -> mid-epoch checkpoint + clean exit
    try:
        for epoch in range(start_epoch, args.epochs):
            epoch_start = time.time()
            epoch_batches = 0
            # mid-epoch resume: fast-forward the seeded stream past the
            # updates completed before the preemption (see cli.train)
            skip_micro = skip_updates * accum if epoch == start_epoch else 0
            epoch_updates = skip_updates if epoch == start_epoch else 0
            batches = multihost.lockstep_batches(
                loader(seed=args.seed + epoch, drop_remainder=True),
                num_batches=steps_per_epoch,
            )
            micro = 0
            for batch in batches:
                epoch_batches += 1
                if skip_micro > 0:
                    skip_micro -= 1
                    continue
                device_batch = multihost.host_local_batch_to_global(
                    {"speech": batch["speech"],
                     "attention_mask": batch["attention_mask"]},
                    mesh,
                )
                # every microbatch draws distinct mask spans (keyed by the
                # global microbatch counter, resume-consistent)
                mask_rng = jax.random.fold_in(
                    jax.random.PRNGKey(args.seed + 7),
                    step_count * accum + micro,
                )
                device_batch["mask_time_indices"] = batch_masks(
                    mask_rng, device_batch["attention_mask"]
                )
                temp = gumbel_temperature(args, step_count)
                if accum == 1:
                    state, metrics = step_fn(
                        state, device_batch, rng, jnp.float32(temp)
                    )
                else:
                    if micro == 0:
                        grads_acc, metrics_acc = init_fn(state.params)
                    grads_acc, metrics_acc = accum_fn(
                        state.params, device_batch, rng, state.step,
                        jnp.int32(micro), jnp.float32(temp),
                        grads_acc, metrics_acc,
                    )
                    micro += 1
                    if micro < accum:
                        continue  # update incomplete: keep accumulating
                    micro = 0
                    state, metrics = apply_fn(state, grads_acc, metrics_acc)
                epoch_updates += 1
                step_count += 1
                if step_count % args.logging_steps == 0:
                    logger.log(
                        {
                            "pretrain/loss": float(metrics["loss"]),
                            "pretrain/contrastive":
                                float(metrics["contrastive_loss"]),
                            "pretrain/diversity":
                                float(metrics["diversity_loss"]),
                            # accumulated metrics come back as sums over
                            # the update's microbatches
                            "pretrain/perplexity":
                                float(metrics["codevector_perplexity"]) / accum,
                            "pretrain/gumbel_temperature": temp,
                            "epoch": epoch,
                        },
                        step=step_count,
                    )
                if _preempt_consensus(
                    epoch_updates, args.preempt_sync_updates
                ):
                    key = epoch * _CKPT_STRIDE + epoch_updates
                    ckpt.save(key, state, wait=True)
                    ckpt.close()
                    print(
                        f"pretrain: preempted — saved epoch {epoch} update "
                        f"{epoch_updates} (key {key}); resume with --resume "
                        f"to continue bit-exactly",
                        flush=True,
                    )
                    raise PreemptExit
            if micro > 0:
                print(
                    f"pretrain epoch {epoch}: dropped {micro} trailing "
                    f"microbatch(es) short of --grad_accum {accum}"
                )
            if epoch_batches == 0:
                raise RuntimeError(
                    "pretraining loader produced no batches — fewer samples "
                    "than the global batch, or no audio found"
                )
            if epoch_updates == 0:
                raise RuntimeError(
                    f"pretrain epoch {epoch}: {epoch_batches} microbatch(es) "
                    f"never completed an optimizer update — the epoch yields "
                    f"fewer batches than --grad_accum {accum}; reduce "
                    "--grad_accum or the batch size"
                )
            if (epoch + 1) % max(args.ckpt_every_epochs, 1) == 0 \
                    or epoch + 1 == args.epochs:
                ckpt.save((epoch + 1) * _CKPT_STRIDE, state)
            logger.log(
                {"pretrain/epoch_time": time.time() - epoch_start,
                 "epoch": epoch},
                step=step_count,
            )
    except KeyboardInterrupt:
        print("pretraining interrupted — saving progress")
    except PreemptExit:
        print("preempted: checkpoint saved; rerun with --resume", flush=True)
        logger.finish()
        return
    ckpt.wait_until_finished()
    ckpt.close()

    # export a fine-tune-ready backbone: cli.train --model_id <out_dir>
    if jax.process_index() == 0:
        from dataclasses import fields as dc_fields

        from ..models.config import Wav2Vec2Config
        from ..models.modeling import Wav2Vec2ForCTC

        out_dir = os.path.join(args.ckpt_dir, "for_ctc")
        host_params = jax.device_get(state.params)
        # downcast to the plain fine-tuning config so cli.train's
        # `from_pretrained(out_dir)` round-trips the config.json
        ctc_config = Wav2Vec2Config(**{
            f.name: getattr(config, f.name) for f in dc_fields(Wav2Vec2Config)
        })
        ctc_params = ctc_params_from_pretraining(
            host_params, ctc_config, jax.random.PRNGKey(args.seed + 2)
        )
        ctc = Wav2Vec2ForCTC(ctc_config, params=ctc_params)
        ctc.save_pretrained(out_dir)
        print(f"saved fine-tune-ready model to {out_dir}")
        if state.ema_params is not None:
            ema_dir = os.path.join(args.ckpt_dir, "for_ctc_ema")
            # the SAME head init rng: the EMA export differs from for_ctc
            # only in the backbone weights, never in the fresh CTC head
            ema_ctc_params = ctc_params_from_pretraining(
                jax.device_get(state.ema_params), ctc_config,
                jax.random.PRNGKey(args.seed + 2),
            )
            Wav2Vec2ForCTC(
                ctc_config, params=ema_ctc_params
            ).save_pretrained(ema_dir)
            print(
                f"saved EMA (decay {args.ema_decay}) fine-tune-ready model "
                f"to {ema_dir}"
            )
    logger.finish()


def parse_args() -> PretrainingArgs:
    parser = argparse.ArgumentParser("wav2vec2 self-supervised pretraining")
    for f_name, f_def in (
        ("epochs", 1), ("warmup_steps", 32000), ("mask_time_length", 10),
        ("batch_size_per_device", 8), ("grad_accum", 1),
        ("audio_maxlen", 246000), ("seed", 0),
        ("total_steps", 0),
        ("logging_steps", 16), ("ckpt_every_epochs", 1), ("model_axis", 1),
        ("preempt_sync_updates", 25),
    ):
        parser.add_argument(f"--{f_name}", type=int, default=f_def)
    for f_name, f_def in (
        ("lr", 5e-4), ("weight_decay", 0.01), ("gumbel_temp_max", 2.0),
        ("gumbel_temp_min", 0.5), ("gumbel_temp_decay", 0.999995),
        ("mask_time_prob", 0.65), ("ema_decay", 0.0),
    ):
        parser.add_argument(f"--{f_name}", type=float, default=f_def)
    parser.add_argument("--compute_dtype", type=str, default="bfloat16")
    parser.add_argument("--remat", action=argparse.BooleanOptionalAction,
                        default=True)
    parser.add_argument("--remat_policy", type=str, default="dots")
    parser.add_argument("--train_tfrecords", nargs="*", default=[])
    parser.add_argument("--train_dir", type=str, default=None)
    parser.add_argument("--config", type=str, default=None,
                        help="config.json with Wav2Vec2PretrainingConfig fields")
    parser.add_argument("--ckpt_dir", type=str, default="pretrain_checkpoints")
    parser.add_argument("--log_dir", type=str, default="logs")
    parser.add_argument("--wandb_project", type=str, default=None)
    parser.add_argument("--resume", type=str, default=None)
    return PretrainingArgs(**vars(parser.parse_args()))


def cli_main() -> None:
    main(parse_args())


if __name__ == "__main__":
    cli_main()
