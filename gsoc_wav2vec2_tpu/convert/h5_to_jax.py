"""Reader for the reference's `tf_model.h5` checkpoint format.

The reference saves weights with Keras `save_weights` to H5
(`/root/reference/src/wav2vec2/modeling.py:22-27`), where each variable is a
dataset whose full name follows the TF naming contract, e.g.
`wav2vec2-ctc/wav2vec2/encoder/layers/0/attention/q_proj/kernel:0`
(SURVEY.md §3.4).  Values are already in TF layout, which is this
framework's native layout, so loading is a pure name-path walk — no
transposes.
"""

from __future__ import annotations

import re
from typing import Dict

import h5py
import jax
import jax.numpy as jnp
import numpy as np


def _collect_h5_weights(path: str) -> Dict[str, np.ndarray]:
    """Flatten every dataset in the file, keyed by the TF variable name."""
    weights: Dict[str, np.ndarray] = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            weights[name] = np.asarray(obj)

    with h5py.File(path, "r") as f:
        # Keras `save_weights` records the canonical variable names in
        # `weight_names` group attributes; prefer those when present.
        found_attrs = False
        for layer_group in f.values():
            if hasattr(layer_group, "attrs") and "weight_names" in layer_group.attrs:
                found_attrs = True
                for wname in layer_group.attrs["weight_names"]:
                    wname = wname.decode() if isinstance(wname, bytes) else wname
                    weights[wname] = np.asarray(layer_group[wname])
        if not found_attrs:
            f.visititems(visit)
    return weights


def _strip(name: str) -> str:
    name = name.split(":")[0]
    for prefix in ("wav2vec2-ctc/", ):
        if name.startswith(prefix):
            name = name[len(prefix):]
    return name


def load_h5_params(path: str, template_params, with_lm_head: bool = True):
    """Populate a parameter tree from a reference H5 checkpoint.

    Per-encoder-layer variables (`encoder/layers/{i}/...`) are gathered and
    stacked along the leading axis to match the `lax.scan` layout.
    """
    raw = {_strip(k): v for k, v in _collect_h5_weights(path).items()}

    layer_re = re.compile(r"^(wav2vec2/)?encoder/layers/(\d+)/(.+)$")
    flat: Dict[str, np.ndarray] = {}
    per_layer: Dict[str, Dict[int, np.ndarray]] = {}
    for name, value in raw.items():
        m = layer_re.match(name)
        if m:
            key = (m.group(1) or "") + "encoder/layers/" + m.group(3)
            per_layer.setdefault(key, {})[int(m.group(2))] = value
        else:
            flat[name] = value
    for key, by_idx in per_layer.items():
        flat[key] = np.stack([by_idx[i] for i in sorted(by_idx)], axis=0)

    paths_and_leaves = jax.tree_util.tree_flatten_with_path(template_params)[0]
    treedef = jax.tree_util.tree_structure(template_params)

    def path_to_name(path) -> str:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        return "/".join(parts)

    new_leaves = []
    missing = []
    for path, leaf in paths_and_leaves:
        name = path_to_name(path)
        if not with_lm_head and not name.startswith(("wav2vec2/", "lm_head")):
            name = "wav2vec2/" + name if ("wav2vec2/" + name) in flat else name
        if name in flat:
            value = flat[name]
            if value.shape != leaf.shape:
                raise ValueError(
                    f"Shape mismatch for {name}: checkpoint {value.shape} vs "
                    f"model {leaf.shape}"
                )
            new_leaves.append(jnp.asarray(value, dtype=leaf.dtype))
        else:
            missing.append(name)
            new_leaves.append(leaf)
    if missing:
        raise KeyError(f"H5 checkpoint is missing variables: {missing[:10]}")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
