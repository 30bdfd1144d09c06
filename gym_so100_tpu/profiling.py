"""Profiling/tracing hooks: jax.profiler capture + stage scopes.

The reference has no profiler integration (SURVEY §5); here every pipeline
stage is annotated with jax.named_scope (see ops/forward.py) so device
traces attribute time to physics stages, and `trace()` wraps
jax.profiler for one-line capture:

    from gym_so100_tpu.profiling import trace
    with trace("/tmp/so100-trace"):
        env.step(es, acts)[1].block_until_ready()

View with TensorBoard (`tensorboard --logdir /tmp/so100-trace`) or
xprof.  On runtimes where device tracing is unsupported (e.g. tunneled
backends), the context manager degrades to a no-op with a warning instead
of raising.
"""

from __future__ import annotations

import contextlib
import warnings

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed block into `logdir`."""
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # tunneled/experimental backends
        warnings.warn(f"profiler trace unavailable: {e}")
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:
                warnings.warn(f"profiler stop failed: {e}")


def annotate(name: str):
    """Stage annotation: jax.named_scope passthrough (shows up in traces
    and HLO op names)."""
    return jax.named_scope(name)
