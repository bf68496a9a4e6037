"""Sharded train / eval steps: one XLA program per step.

The reference's hot loop is Keras `model.fit` under a `TPUStrategy` scope
(`/root/reference/src/main.py:192-255`): per-step forward, CTC loss computed
*outside* the jitted region (because `tf.nn.ctc_loss` does not XLA-compile,
reference `tests/test_wav2vec2.py:196-210`), backward, implicit cross-replica
gradient all-reduce.

TPU-native version: forward + CTC loss + backward + Adam update compile into
a single `jit` over a ("data", "model") mesh.  Sharding follows the data:
the caller places the batch with `P("data")` and the parameters with the
tensor-parallel rules (`parallel/partition.py`); GSPMD propagates those
shardings through the whole step and inserts the gradient reductions over
ICI — there is no hand-written collective anywhere.  Loss reduction matches
the reference exactly: SUM over the global batch divided by
`division_factor` (= global batch size, `main.py:196-200`).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import optax

from ..models.config import Wav2Vec2Config
from ..models.modeling import wav2vec2_for_ctc_forward
from ..ops.ctc import ctc_loss_fn
from .state import TrainState


def global_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def _make_ctc_loss_fn(
    config: Wav2Vec2Config,
    *,
    division_factor: float,
    with_attention_mask: bool,
    length_aware: bool,
    compute_dtype,
    remat,
    mesh,
    attention_impl: str,
    frozen: tuple,
):
    """`(params, batch, rng) -> scalar` — SUM of per-sample CTC losses over
    this batch divided by `division_factor` (reference semantics,
    `main.py:196-200`).  Shared by the fused train step and the
    gradient-accumulation steps."""

    def loss_fn(params, batch, rng):
        mask = batch.get("attention_mask") if with_attention_mask else None
        logits = wav2vec2_for_ctc_forward(
            params,
            config,
            batch["speech"],
            mask,
            training=True,
            rng=rng,
            compute_dtype=compute_dtype,
            remat=remat,
            mesh=mesh,
            attention_impl=attention_impl,
            frozen=frozen,
        )
        b, t = logits.shape[0], logits.shape[1]
        if length_aware and mask is not None:
            sample_lengths = jnp.sum(mask.astype(jnp.int32), axis=-1)
            logit_lengths = config.conv_output_length(sample_lengths)
        else:
            # reference quirk kept for recipe parity: constant logit length
            # including padding frames (`losses.py:29-30,47-56`)
            logit_lengths = jnp.full((b,), t, jnp.int32)
        per_sample = ctc_loss_fn(logits, batch["labels"], logit_lengths, config.pad_id)
        return jnp.sum(per_sample) / division_factor

    return loss_fn


def _ema_update(ema_params, params, decay):
    """One EMA step `ema <- decay*ema + (1-decay)*params` (classic Polyak
    shadow weights — the online counterpart of `cli.average`'s offline tail
    averaging; the reference has neither).  Accumulates in the parameter
    dtype (float32 here), no bias correction: the shadow is initialised AT
    the initial params, not at zero, so early steps are already unbiased."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params,
        params,
    )


def make_train_step(
    config: Wav2Vec2Config,
    tx: optax.GradientTransformation,
    *,
    division_factor: float,
    with_attention_mask: bool = False,
    length_aware: bool = False,
    compute_dtype=jnp.bfloat16,
    remat: bool = True,
    mesh=None,
    attention_impl: str = "auto",
    frozen: tuple = (),
    ema_decay: float | None = None,
):
    """Build the jitted `(state, batch, rng) -> (state, metrics)` step.

    `batch` is a dict with ``speech`` (B, L) float32, ``labels`` (B, U) int32
    and optionally ``attention_mask`` (B, L).  State buffers are donated —
    parameters and optimizer slots update in place in HBM.

    `mesh` makes the flash-attention kernel partition-aware (shard_map over
    batch/heads instead of an opaque gathered custom call — see
    `ops/attention.py::mha`).

    `frozen` names the recipe's frozen subtrees ("feature_extractor" /
    "wav2vec2" — same names as `trainable_mask`): gradients stop at the
    freeze boundary, so XLA never builds the frozen region's backward.
    Must match the optimizer mask (`optax.set_to_zero` keeps the parameter
    trajectory bit-identical either way; this just removes dead compute).

    `ema_decay` maintains shadow weights in `state.ema_params`
    (`ema <- decay*ema + (1-decay)*params` after each update); the state
    must then carry an `ema_params` pytree (usually initialised to a copy
    of the initial params).
    """
    loss_fn = _make_ctc_loss_fn(
        config,
        division_factor=division_factor,
        with_attention_mask=with_attention_mask,
        length_aware=length_aware,
        compute_dtype=compute_dtype,
        remat=remat,
        mesh=mesh,
        attention_impl=attention_impl,
        frozen=frozen,
    )

    def step_fn(state: TrainState, batch: dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, step_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = (
            _ema_update(state.ema_params, params, ema_decay)
            if ema_decay is not None
            else state.ema_params
        )
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state,
            ema_params=ema,
        )
        metrics = {"loss": loss, "grad_norm": global_norm(grads)}
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_grad_accum_steps(
    config: Wav2Vec2Config,
    tx: optax.GradientTransformation,
    *,
    division_factor: float,
    with_attention_mask: bool = False,
    length_aware: bool = False,
    compute_dtype=jnp.bfloat16,
    remat: bool = True,
    mesh=None,
    attention_impl: str = "auto",
    frozen: tuple = (),
    ema_decay: float | None = None,
):
    """Gradient accumulation: `(init_fn, accum_fn, apply_fn)`.

    The reference's recipe runs at global batch 256 = 8 chips × 32
    (`/root/reference/src/main.py:156`); a single chip (or a smaller mesh)
    cannot hold that batch, so the driver splits each optimizer update into
    N microbatches.  Because the loss is SUM over the *effective* batch
    divided by `division_factor` (set to the effective batch size), summing
    microbatch gradients reproduces the big-batch update exactly — the
    parameter trajectory matches a single N×-sized step up to float
    reassociation.

    Protocol per optimizer update::

        grads, loss = init_fn(state.params)          # zeroed accumulators
        for i, batch in enumerate(microbatches):     # any i-varying shapes
            grads, loss = accum_fn(state.params, batch, rng, state.step,
                                   jnp.int32(i), grads, loss)
        state, metrics = apply_fn(state, grads, loss)

    `accum_fn` donates the accumulators (grads update in place in HBM);
    `apply_fn` donates state + accumulators.  Peak memory is one
    microbatch's activations plus one params-sized gradient buffer, so the
    effective batch is bounded by step *time*, not HBM.  Each microbatch
    gets a distinct dropout stream via `fold_in(fold_in(rng, step), i)`.
    Microbatches may differ in shape (bucketed training): each shape
    compiles one accum program, while `apply_fn` compiles once.
    """
    loss_fn = _make_ctc_loss_fn(
        config,
        division_factor=division_factor,
        with_attention_mask=with_attention_mask,
        length_aware=length_aware,
        compute_dtype=compute_dtype,
        remat=remat,
        mesh=mesh,
        attention_impl=attention_impl,
        frozen=frozen,
    )

    def init_fn(params):
        # jitted so the zero buffers inherit the params' mesh shardings
        return (
            jax.tree.map(jnp.zeros_like, params),
            jnp.zeros((), jnp.float32),
        )

    def accum_fn(params, batch, rng, step, micro_index, grads_acc, loss_acc):
        step_rng = jax.random.fold_in(jax.random.fold_in(rng, step), micro_index)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, step_rng)
        grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
        return grads_acc, loss_acc + loss

    def apply_fn(state: TrainState, grads_acc, loss_acc):
        updates, opt_state = tx.update(grads_acc, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = (
            _ema_update(state.ema_params, params, ema_decay)
            if ema_decay is not None
            else state.ema_params
        )
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state,
            ema_params=ema,
        )
        metrics = {"loss": loss_acc, "grad_norm": global_norm(grads_acc)}
        return new_state, metrics

    return (
        jax.jit(init_fn),
        jax.jit(accum_fn, donate_argnums=(5, 6)),
        jax.jit(apply_fn, donate_argnums=(0, 1)),
    )


def make_eval_step(
    config: Wav2Vec2Config,
    *,
    with_attention_mask: bool = False,
    compute_dtype=jnp.bfloat16,
    mesh=None,
):
    """Jitted `(params, batch) -> (greedy_ids, frame_lengths)` for WER eval.

    The argmax runs on device; the CTC groupby collapse and string join stay
    on host (`data/processor.py::decode`).  `frame_lengths` lets the host
    drop padding frames before the collapse — the capability the reference's
    constant-pad eval path lacked (it costs 2.7 WER points, SURVEY.md §6).
    """

    def eval_fn(params, batch):
        mask = batch.get("attention_mask") if with_attention_mask else None
        logits = wav2vec2_for_ctc_forward(
            params, config, batch["speech"], mask, training=False,
            compute_dtype=compute_dtype, mesh=mesh,
        )
        predictions = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if mask is not None:
            lengths = config.conv_output_length(
                jnp.sum(mask.astype(jnp.int32), axis=-1)
            ).astype(jnp.int32)
        else:
            lengths = jnp.full((logits.shape[0],), logits.shape[1], jnp.int32)
        return predictions, lengths

    return jax.jit(eval_fn)
