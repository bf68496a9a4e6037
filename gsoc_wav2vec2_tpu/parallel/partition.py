"""Parameter partitioning rules (tensor parallelism) for wav2vec2.

The reference has no model sharding of any kind (SURVEY.md §2.5: data
parallelism only).  Here every transformer layer is Megatron-sharded over
the ``model`` mesh axis:

  * ``q/k/v_proj``           kernels column-sharded (attention heads split),
  * ``out_proj``             kernel row-sharded (XLA inserts the all-reduce),
  * ``intermediate_dense``   kernel column-sharded (FFN hidden units split),
  * ``output_dense``         kernel row-sharded (all-reduce),
  * everything else (conv front-end, norms, positional conv, lm_head)
    replicated — those are <5%% of parameters and of FLOPs.

Because the encoder layers are *stacked* for `lax.scan`
(`models/modeling.py:init_wav2vec2_params`), every per-layer spec carries a
leading ``None`` for the layer-stack dimension.

GSPMD propagates these parameter shardings through the forward/backward
graph, so no explicit collectives appear anywhere in model code — the
compiler schedules all-reduces on ICI (scaling-book recipe: pick a mesh,
annotate, let XLA insert collectives).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# (parent key, leaf key) -> spec for the *trailing* dims of stacked
# (layer-major) encoder parameters.
_COLUMN = {"q_proj", "k_proj", "v_proj", "intermediate_dense"}
_ROW = {"out_proj", "output_dense"}


def _path_keys(path) -> list:
    keys = []
    for entry in path:
        if isinstance(entry, jax.tree_util.DictKey):
            keys.append(entry.key)
        elif isinstance(entry, jax.tree_util.SequenceKey):
            keys.append(entry.idx)
        else:
            keys.append(str(entry))
    return keys


def _leaf_spec(path, leaf) -> P:
    keys = _path_keys(path)
    names = [k for k in keys if isinstance(k, str)]
    in_layer_stack = "layers" in names
    parent = names[-2] if len(names) >= 2 else None
    leaf_name = names[-1] if names else None

    def stackify(*spec):
        """Prepend a None for the layer-stack dim when inside the scan stack."""
        return P(*(((None,) + spec) if in_layer_stack else spec))

    if parent in _COLUMN:
        if leaf_name == "kernel":
            return stackify(None, MODEL_AXIS)
        if leaf_name == "bias":
            return stackify(MODEL_AXIS)
    if parent in _ROW:
        if leaf_name == "kernel":
            return stackify(MODEL_AXIS, None)
        # row-parallel bias is added after the all-reduce: replicate
        return P()
    return P()


def param_specs(params) -> dict:
    """PartitionSpec pytree matching `params` (tensor-parallel rules)."""
    return jax.tree_util.tree_map_with_path(_leaf_spec, params)


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for `params` on `mesh`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _leaf_spec(path, leaf)), params
    )


def shard_params(params, mesh: Mesh):
    """Place a (host or single-device) param tree onto the mesh."""
    return jax.device_put(params, param_shardings(params, mesh))
