"""Device availability probes + persistent-compile-cache setup.

Equivalent of the reference's `is_tpu_available` / `is_gpu_available`
(`/root/reference/src/training_utils.py:51-56`), which counted TF logical
devices.  Here they query the JAX backend — and never raise: a probe that
crashes on a CPU-only host defeats its purpose.
"""

from __future__ import annotations

import os

import jax


def _count(platform: str) -> int:
    try:
        return len([d for d in jax.devices() if d.platform == platform])
    except RuntimeError:
        return 0


def is_tpu_available() -> bool:
    """True when at least one TPU chip is attached (any TPU-like platform,
    including tunnelled backends that report a vendor platform name)."""
    try:
        platform = jax.default_backend()
    except RuntimeError:
        return False
    if platform not in ("cpu", "gpu", "cuda", "rocm"):
        return jax.device_count() > 0
    return _count("tpu") > 0


def is_gpu_available() -> bool:
    return _count("gpu") > 0 or _count("cuda") > 0 or _count("rocm") > 0


def enable_persistent_compile_cache() -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    XLA compiles of the training/serving programs are tens of seconds to
    minutes each (and multiply across serving buckets); with the cache on,
    a process restart — a preempted trainer resuming, a serving daemon
    rolling, a repeated benchmark — replays them in milliseconds.  The
    reference has no analog (its SavedModel export bakes one fixed shape;
    every `jit_compile=True` restart recompiles, `readme.md:157-165`).

    Directory resolution: `$W2V2_COMPILE_CACHE` if set (`off` disables),
    else `.jax_cache/` next to the repo root when writable (shared with
    `__graft_entry__.py::dryrun_multichip`), else
    `~/.cache/gsoc_wav2vec2_tpu/jax_cache`.  Returns the directory in use,
    or None when disabled/unavailable.  Safe to call multiple times.
    """
    cache_dir = os.environ.get("W2V2_COMPILE_CACHE", "")
    if cache_dir == "off":
        return None
    candidates = (
        [cache_dir]
        if cache_dir
        else [
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)
                ))),
                ".jax_cache",
            ),
            os.path.join(
                os.path.expanduser("~"), ".cache", "gsoc_wav2vec2_tpu",
                "jax_cache",
            ),
        ]
    )
    for d in candidates:
        try:
            os.makedirs(d, exist_ok=True)
        except OSError:
            continue
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return d
    return None
