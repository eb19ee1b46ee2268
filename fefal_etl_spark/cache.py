"""Central registry for per-call persisted frames.

Several registry queries persist an intermediate that feeds multiple
downstream legs of the SAME returned plan (e.g. `quality_rank_blend`'s
feature frame, `matryoshka_recall`'s per-dim corpus). The returned
DataFrame is lazy, so the query function cannot unpersist before the
caller materializes it — but in a long shared session (bench loops, the
driver's 191-query sweep) those cached blocks would otherwise accumulate
for the application lifetime: exactly the memory pressure behind the r2
late-suite OOM.

Pattern: query functions call ``track(df.persist())``; harness loops call
``release_tracked()`` after materializing each query's result. Named
family caches that are REUSED across calls (`_COPURCHASE`, the pipeline
star frames) keep their own release hooks — this registry is only for
single-call scratch persists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted frame for later bulk release."""
    _TRACKED.append(df)
    return df


def release_tracked() -> None:
    """Unpersist every tracked frame (safe to call repeatedly)."""
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:
            pass
