"""Device availability probes.

Equivalent of the reference's `is_tpu_available` / `is_gpu_available`
(`/root/reference/src/training_utils.py:51-56`), which counted TF logical
devices.  Here they query the JAX backend — and never raise: a probe that
crashes on a CPU-only host defeats its purpose.
"""

from __future__ import annotations

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
