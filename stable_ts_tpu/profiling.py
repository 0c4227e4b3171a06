"""Profiling hooks: optional jax.profiler tracing around task drivers.

The reference has no tracing at all (SURVEY §5.1 — tqdm bars only); on TPU
the useful observability is an XLA trace viewable in TensorBoard/Perfetto.
Enable by setting ``STABLE_TS_TPU_PROFILE=/path/to/tracedir`` or by using
:func:`profile_trace` directly::

    with stable_ts_tpu.profiling.profile_trace('/tmp/trace'):
        model.transcribe(audio)

Every task driver (transcribe / align / refine / locate) enters
:func:`maybe_trace`, which is a no-op unless the env var is set.
"""
import contextlib
import os
from typing import Optional

_ENV = 'STABLE_TS_TPU_PROFILE'


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Trace all device activity in the block into ``log_dir``."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def traced(task: str):
    """Decorator: run the wrapped task driver under :func:`maybe_trace`."""
    import functools

    def wrap(fn):
        @functools.wraps(fn)
        def inner(*args, **kwargs):
            with maybe_trace(task):
                return fn(*args, **kwargs)
        return inner
    return wrap


_active = False


@contextlib.contextmanager
def maybe_trace(task: str, log_dir: Optional[str] = None):
    """Trace the block iff profiling is enabled (env var or explicit dir).

    Nested drivers (e.g. refine auto-invoking align_words) reuse the
    outermost trace instead of starting a second one.
    """
    global _active
    target = log_dir or os.environ.get(_ENV)
    if not target or _active:
        yield
        return
    _active = True
    try:
        with profile_trace(os.path.join(target, task)):
            yield
    finally:
        _active = False
