#!/usr/bin/env bash
# Two-stage CTC fine-tuning — the reference recipe as a script
# (`/root/reference/src/main.py:204-255`: stage 1 trains the LM head at
# 1e-3; stage 2 unfreezes all but the conv front-end at 1e-4 → 5e-5).
#
# Usage:
#   MODEL_ID=path/or/hub-id DATA_DIR=LibriSpeech/train-clean-100 \
#       bash examples/finetune.sh
#   MODEL_ID=... TRAIN_TFRECORDS='gs://bucket/train/*.tfrecord' \
#       bash examples/finetune.sh --batch_size_per_device 32
#
# Every knob is an env var with the reference's default; extra CLI args
# pass straight through to `gsoc_wav2vec2_tpu.cli.train`.
set -euo pipefail

: "${MODEL_ID:?set MODEL_ID to a local model dir or hub id}"
if [[ -z "${DATA_DIR:-}" && -z "${TRAIN_TFRECORDS:-}" ]]; then
    echo "set DATA_DIR (raw corpus) or TRAIN_TFRECORDS (shard pattern)" >&2
    exit 2
fi

python -m gsoc_wav2vec2_tpu.cli.train \
    --model_id "$MODEL_ID" \
    ${DATA_DIR:+--train_dir "$DATA_DIR"} \
    ${TRAIN_TFRECORDS:+--train_tfrecords "$TRAIN_TFRECORDS"} \
    ${VAL_DIR:+--val_dir "$VAL_DIR"} \
    --stage1_epochs "${STAGE1_EPOCHS:-15}" \
    --stage2_epochs "${STAGE2_EPOCHS:-15}" \
    --transition_epoch "${TRANSITION_EPOCH:-10}" \
    --batch_size_per_device "${BATCH_SIZE:-32}" \
    --grad_accum "${GRAD_ACCUM:-1}" \
    --audio_maxlen "${AUDIO_MAXLEN:-246000}" \
    --labels_maxlen "${LABELS_MAXLEN:-256}" \
    --ckpt_dir "${CKPT_DIR:-checkpoints}" \
    --log_dir "${LOG_DIR:-logs}" \
    "$@"
