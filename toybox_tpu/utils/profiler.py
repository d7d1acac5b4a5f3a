"""Device profiling helpers (SURVEY.md §5 tracing: jax.profiler traces /
xprof replace the reference's logger.ProfileKV-only story; ProfileKV
itself lives in toybox_tpu.utils.logger)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/toybox_trace"):
    """Capture a jax.profiler trace viewable in xprof/tensorboard."""
    import jax

    with jax.profiler.trace(logdir):
        yield
    print(f"profiler trace written to {logdir}")


@contextlib.contextmanager
def wall_timer(name: str, logger=None):
    """Wall-clock block timer; logs wait_<name> like the reference's
    ProfileKV when given a logger."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if logger is not None:
        logger.logkv_mean(f"wait_{name}", dt)
    else:
        print(f"{name}: {dt:.3f}s")


def annotate(name: str):
    """Named trace annotation decorator (jax.profiler.TraceAnnotation)."""
    import jax

    def deco(fn):
        def wrapper(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)
        return wrapper
    return deco
