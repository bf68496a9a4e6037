"""Train state + optimizer recipes.

The reference trains with Keras `model.fit` in two stages
(`/root/reference/src/main.py:204-255`):

  stage 1: backbone frozen (`model.layers[0].trainable = False`), Adam 1e-3,
           trains only the LM head;
  stage 2: everything unfrozen except the 7 conv feature-extractor layers,
           Adam 1e-4 dropping to 5e-5 after epoch 10
           (`training_utils.py:24-31`).

Keras encodes freezing by mutating `trainable` flags; the JAX equivalent is
an `optax.masked` wrapper built from a bool pytree (True = trainable), as
produced by `Wav2Vec2Model.freeze_feature_extractor` / `trainable_mask`.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    # Optional EMA shadow of `params` (None = disabled; a pytree when the
    # step was built with `ema_decay`).  `None` is an empty pytree subtree,
    # so states without EMA keep their checkpoint structure — Orbax
    # checkpoints from pre-EMA runs restore unchanged.
    ema_params: Any = None


def trainable_mask(params, frozen_subtrees=()) -> Any:
    """Bool pytree: False for every leaf under a key in `frozen_subtrees`.

    `frozen_subtrees` entries are dict-key names matched anywhere in the
    path, e.g. ``("feature_extractor",)`` freezes the conv stack and
    ``("wav2vec2",)`` freezes the whole backbone (stage 1).
    """

    def walk(tree, frozen):
        if isinstance(tree, dict):
            return {k: walk(v, frozen or (k in frozen_subtrees)) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(walk(v, frozen) for v in tree)
        return not frozen

    return walk(params, False)


def stage2_lr_schedule(
    lr1: float = 1e-4, lr2: float = 5e-5, transition_step: int = 0
) -> optax.Schedule:
    """Step function `lr1 until transition_step, then lr2`.

    Mirrors the reference's epoch-keyed `LearningRateScheduler`
    (`training_utils.py:24-31`) but keyed on optimizer steps, which is what
    a jitted train loop sees.
    """
    return optax.join_schedules(
        [optax.constant_schedule(lr1), optax.constant_schedule(lr2)],
        [transition_step],
    )


def create_optimizer(
    learning_rate, trainable: Optional[Any] = None, dynamic_lr: bool = False
) -> optax.GradientTransformation:
    """Adam (reference uses `tf.keras.optimizers.Adam`, `main.py:216,242`),
    optionally masked so frozen parameters receive zero updates.

    `dynamic_lr=True` routes the learning rate through
    `optax.inject_hyperparams`, making it a value inside `opt_state` that the
    host can change between steps (`set_learning_rate`) without recompiling
    the jitted train step — the mechanism behind the reference's epoch-keyed
    `LearningRateScheduler` (`training_utils.py:24-31`).  `learning_rate`
    must then be a float, not a schedule.

    Note: `optax.masked` alone would pass raw gradients through for the
    frozen leaves — frozen params need an explicit `set_to_zero` branch.
    """
    if dynamic_lr:
        tx = optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)
    else:
        tx = optax.adam(learning_rate)
    if trainable is not None:
        labels = jax.tree.map(lambda t: "train" if t else "freeze", trainable)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx


def _map_inject_states(opt_state, fn):
    """Apply `fn` to every `InjectHyperparamsState` in an opt-state tree,
    recursing through namedtuples / tuples / lists / dicts (the containers
    optax composes states from)."""
    def rec(node):
        # duck-typed: optax has used InjectHyperparamsState and
        # InjectStatefulHyperparamsState across versions; both are
        # namedtuples with (hyperparams, inner_state)
        if (
            isinstance(node, tuple)
            and hasattr(node, "_fields")
            and "hyperparams" in node._fields
            and "inner_state" in node._fields
        ):
            node = fn(node)
            return node._replace(inner_state=rec(node.inner_state))
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # namedtuple
            return type(node)(*(rec(x) for x in node))
        if isinstance(node, (list, tuple)):
            return type(node)(rec(x) for x in node)
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(opt_state)


def set_learning_rate(opt_state, lr: float):
    """Return a copy of `opt_state` with every injected learning rate set to
    `lr`.  No recompile: the LR is an array leaf of the donated state."""
    import jax.numpy as jnp

    def setter(node: optax.InjectHyperparamsState):
        hp = dict(node.hyperparams)
        if "learning_rate" in hp:
            prev = hp["learning_rate"]
            new = jnp.asarray(lr, dtype=jnp.asarray(prev).dtype)
            # keep the previous leaf's sharding so the jitted step's input
            # signature is unchanged (a fresh uncommitted scalar would force
            # a recompile of the whole train step)
            sharding = getattr(prev, "sharding", None)
            if sharding is not None:
                new = jax.device_put(new, sharding)
            hp["learning_rate"] = new
        return node._replace(hyperparams=hp)

    return _map_inject_states(opt_state, setter)


def get_learning_rate(opt_state) -> Optional[float]:
    """Current injected learning rate (for logging), or None if static."""
    found = []

    def getter(node: optax.InjectHyperparamsState):
        if "learning_rate" in node.hyperparams:
            found.append(float(jax.device_get(node.hyperparams["learning_rate"])))
        return node

    _map_inject_states(opt_state, getter)
    return found[0] if found else None


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    import jax.numpy as jnp

    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))
