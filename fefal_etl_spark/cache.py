"""Central registry for per-call persisted frames.

Several registry queries persist an intermediate that feeds multiple
downstream legs of the SAME returned plan (e.g. `quality_rank_blend`'s
feature frame, `matryoshka_recall`'s per-dim corpus). The returned
DataFrame is lazy, so the query function cannot unpersist before the
caller materializes it — but in a long shared session (bench loops, the
driver's full-registry sweep) those cached blocks would otherwise
accumulate for the application lifetime: exactly the memory pressure
behind the r2 late-suite OOM.

Pattern: query functions call ``track(df.persist())``; harness loops call
``release_tracked()`` after materializing each query's result. Named
family caches that are REUSED across calls (`_COPURCHASE`, the pipeline
star frames) keep their own release hooks — this registry is only for
single-call scratch persists.

Concurrency (ADVICE r4): the registry is guarded by a lock, and
harnesses that run queries on MULTIPLE THREADS should use
:func:`tracking_scope` — a context manager giving each in-flight query
its own tracking list and release handle, so one thread's
``release_tracked()`` can never unpersist frames another thread's query
still depends on. (Correctness was never at risk — Spark recomputes an
unpersisted frame — but the persist's benefit was silently lost.)
Without an active scope, ``track`` falls back to the process-global
list, preserving the single-threaded harness contract.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: list[DataFrame] = []
_SCOPED = threading.local()  # .stack: list[list[DataFrame]] per thread


def _current_list() -> list[DataFrame]:
    stack = getattr(_SCOPED, "stack", None)
    if stack:
        return stack[-1]
    return _TRACKED


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted frame for later bulk release: into
    the innermost :func:`tracking_scope` on this thread if one is
    active, else the process-global list."""
    with _LOCK:
        _current_list().append(df)
    return df


def _drain(frames: list[DataFrame]) -> None:
    while frames:
        df = frames.pop()
        try:
            df.unpersist()
        except Exception:
            pass


def release_tracked() -> None:
    """Unpersist every frame in the CURRENT tracking context (the active
    scope on this thread, else the global list). Safe to call
    repeatedly."""
    with _LOCK:
        frames = list(_current_list())
        _current_list().clear()
    _drain(frames)


@contextmanager
def tracking_scope():
    """Scope tracking to one query invocation: ``with tracking_scope():``
    collects every ``track()`` on this thread into a private list and
    unpersists exactly those frames on exit — the thread-safe form of
    the track/release_tracked pair for concurrent harnesses."""
    frames: list[DataFrame] = []
    with _LOCK:
        if not hasattr(_SCOPED, "stack"):
            _SCOPED.stack = []
        _SCOPED.stack.append(frames)
    try:
        yield frames
    finally:
        with _LOCK:
            _SCOPED.stack.pop()
            pending = list(frames)
            frames.clear()
        _drain(pending)
