"""Profiling / tracing helpers.

The reference has no profiler at all (SURVEY.md §5: only an ad-hoc timeit in
the ONNX notebook).  JAX gives Perfetto/TensorBoard traces for free; these
helpers standardise capture and the readback-forced wall timing that this
environment's remote TPU tunnel requires (`block_until_ready` can return
before execution completes — see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace", create_perfetto_link: bool = False):
    """Capture a profiler trace around a block.

    View in TensorBoard (`tensorboard --logdir <dir>`) or via the Perfetto
    link (needs a browser).
    """
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timeit(
    fn: Callable[[], jax.Array],
    iters: int = 20,
    warmup: int = 3,
) -> float:
    """Mean seconds per call, forcing completion with a scalar readback.

    `fn` must return a jax array; its scalar sum is fetched to host after
    the timed chain so asynchronous dispatch (and the tunnel's unreliable
    block_until_ready) cannot fake the timing.
    """
    for _ in range(warmup):
        float(jnp.sum(fn()))
    start = time.perf_counter()
    acc: Optional[jax.Array] = None
    for _ in range(iters):
        acc = jnp.sum(fn())
    float(acc)
    return (time.perf_counter() - start) / iters


def annotate(name: str):
    """Named profiler region (shows up in trace timelines)."""
    return jax.profiler.TraceAnnotation(name)
