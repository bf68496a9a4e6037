"""Test configuration: force CPU with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh
(`--xla_force_host_platform_device_count=8`), the JAX-native replacement for
the reference's "just run it on a real v3-8" validation story
(SURVEY.md §4).

Note: this environment's sitecustomize pre-imports JAX with the axon TPU
plugin before conftest runs, so setting `JAX_PLATFORMS` via env here is too
late — `jax.config.update` after import is the reliable switch (and keeps
tests numerically exact: TPU matmuls default to bf16 internals).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

if os.environ.get("W2V2_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu"
