#!/usr/bin/env bash
# Self-supervised wav2vec2 pretraining — the objective that produces the
# checkpoints `examples/finetune.sh` starts from (arXiv:2006.11477; the
# reference framework only CONSUMES such checkpoints, this script trains
# them).  Exports a fine-tune-ready backbone to $CKPT_DIR/for_ctc, which
# feeds straight into `MODEL_ID=$CKPT_DIR/for_ctc bash examples/finetune.sh`.
#
# Usage:
#   DATA_DIR=LibriSpeech/train-clean-100 bash examples/pretrain.sh
#   TRAIN_TFRECORDS='gs://bucket/train/*.tfrecord' bash examples/pretrain.sh \
#       --batch_size_per_device 8
#
# Extra CLI args pass straight through to `gsoc_wav2vec2_tpu.cli.pretrain`.
set -euo pipefail

if [[ -z "${DATA_DIR:-}" && -z "${TRAIN_TFRECORDS:-}" ]]; then
    echo "set DATA_DIR (raw corpus) or TRAIN_TFRECORDS (shard pattern)" >&2
    exit 2
fi

python -m gsoc_wav2vec2_tpu.cli.pretrain \
    ${DATA_DIR:+--train_dir "$DATA_DIR"} \
    ${TRAIN_TFRECORDS:+--train_tfrecords "$TRAIN_TFRECORDS"} \
    --epochs "${EPOCHS:-1}" \
    --lr "${LR:-5e-4}" \
    --warmup_steps "${WARMUP_STEPS:-32000}" \
    --batch_size_per_device "${BATCH_SIZE:-8}" \
    --grad_accum "${GRAD_ACCUM:-1}" \
    --audio_maxlen "${AUDIO_MAXLEN:-246000}" \
    --mask_time_prob "${MASK_TIME_PROB:-0.65}" \
    --ckpt_dir "${CKPT_DIR:-pretrain_checkpoints}" \
    --log_dir "${LOG_DIR:-logs}" \
    "$@"
