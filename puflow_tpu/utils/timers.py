"""Wall-clock timers and profiling hooks.

Parity target: reference `utils/time.py:18-87` (`ElapseTimer`,
`ContextTimer`, `func_timer`) plus a `jax.profiler` trace context the
reference never had (SURVEY.md §5.1 calls for xprof traces in the rebuild).
"""

from __future__ import annotations

import contextlib
import functools
import time


class ElapseTimer:
    """Accumulating stopwatch: start()/stop() pairs, total in seconds."""

    def __init__(self):
        self.total = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self) -> float:
        if self._t0 is None:
            return self.total
        self.total += time.perf_counter() - self._t0
        self._t0 = None
        return self.total

    def reset(self):
        self.total, self._t0 = 0.0, None


@contextlib.contextmanager
def context_timer(label: str = "", log_fn=print):
    t0 = time.perf_counter()
    yield
    log_fn(f"{label or 'block'}: {time.perf_counter() - t0:.4f}s")


def func_timer(fn=None, *, log_fn=print):
    """Decorator printing each call's wall time."""
    def deco(f):
        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            t0 = time.perf_counter()
            out = f(*args, **kwargs)
            log_fn(f"{f.__name__}: {time.perf_counter() - t0:.4f}s")
            return out
        return wrapper
    return deco(fn) if fn is not None else deco


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax/xprof device trace around a code block.

    Usage: ``with profile_trace('/tmp/trace'): step(...)`` then inspect with
    tensorboard/xprof. No-ops gracefully if the backend can't trace.
    """
    import jax

    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
        yield
    except Exception:
        if not started:
            yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
