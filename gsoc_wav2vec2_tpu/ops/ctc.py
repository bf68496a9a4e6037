"""CTC loss — fully jittable on TPU.

The reference wraps `tf.nn.ctc_loss`, which does NOT compile under XLA, so
its training loop computes the loss outside the jitted region (documented in
the reference's own test, `tests/test_wav2vec2.py:196-210`).  Here the loss
is `optax.ctc_loss` (a lax.scan forward algorithm), so the whole train step
— forward, loss, backward, optimiser — compiles into one XLA program.

Reference semantics preserved (`/root/reference/src/wav2vec2/losses.py:4-56`):
  * logit lengths are the *constant* model input length run through the conv
    stride arithmetic — padding frames are NOT excluded (a deliberate quirk
    of the reference's training recipe);
  * label length = number of non-pad ids;
  * `blank_index == pad_id == 0`;
  * per-sample losses are summed and divided by `division_factor`
    (the global batch size under data parallelism, `main.py:196-200`).

`length_aware=True` switches to correct length-masked logit lengths derived
from a sample-level attention mask — the capability upgrade the reference
lacked (its constant-pad eval loses 2.7 WER points, SURVEY.md §6).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def ctc_loss_fn(
    logits: jax.Array,
    labels: jax.Array,
    logit_lengths: jax.Array,
    pad_id: int = 0,
) -> jax.Array:
    """Per-sample CTC negative log-likelihood.

    Args:
      logits: (B, T, V) float32 log-probabilities *inputs* (unnormalised).
      labels: (B, U) int labels, `pad_id`-padded.
      logit_lengths: (B,) valid frame counts.
    Returns:
      (B,) per-sample loss.
    """
    b, t, _ = logits.shape
    logit_paddings = (
        jnp.arange(t)[None, :] >= logit_lengths[:, None]
    ).astype(jnp.float32)
    label_paddings = (labels == pad_id).astype(jnp.float32)
    return optax.ctc_loss(
        logits, logit_paddings, labels, label_paddings, blank_id=pad_id
    )


class CTCLoss:
    """Drop-in equivalent of the reference `CTCLoss` Keras loss.

    `model_input_shape` is (batch_size, audio_len); the logit length is the
    constant conv-stack output length of `audio_len` (reference
    `losses.py:29-30,47-56`).
    """

    def __init__(
        self,
        config,
        model_input_shape,
        division_factor: int = 1,
        length_aware: bool = False,
    ):
        self.config = config
        self.pad_id = config.pad_id
        self.division_factor = division_factor
        self.model_input_shape = tuple(model_input_shape)
        self.length_aware = length_aware
        self._const_logit_length = int(
            config.conv_output_length(self.model_input_shape[1])
        )

    def __call__(
        self,
        labels: jax.Array,
        logits: jax.Array,
        attention_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        """SUM of per-sample CTC losses / division_factor (reference
        `losses.py:6,45`, `main.py:196-200`)."""
        b = logits.shape[0]
        if self.length_aware and attention_mask is not None:
            sample_lengths = jnp.sum(attention_mask.astype(jnp.int32), axis=-1)
            logit_lengths = self.config.conv_output_length(sample_lengths)
        else:
            logit_lengths = jnp.full((b,), self._const_logit_length, jnp.int32)
        per_sample = ctc_loss_fn(
            logits.astype(jnp.float32), labels, logit_lengths, self.pad_id
        )
        return jnp.sum(per_sample) / self.division_factor
