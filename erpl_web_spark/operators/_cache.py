"""Lifecycle tracking for operator-internal persisted frames.

Several lazy-return operators persist an intermediate because two or
more downstream consumers read it (the exploded bigram frame, the
shingle-hash table, the winnow fingerprints). The operator cannot
unpersist it — the returned DataFrame is lazy and still reads the
cache — so by convention the cache lives until session end unless the
caller passes ``cache_sink`` and unpersists after materializing.

That convention is silent: a long-lived driver (a streaming
``foreachBatch`` loop calling a persisting operator per batch) quietly
accumulates one cached frame per batch until the session dies. This
module makes it LOUD and releasable:

- ``track_persist(df, operator, cache_sink)`` — the one place every
  internal persist routes through. With a ``cache_sink`` the frame
  goes to the caller (caller owns lifetime, nothing tracked); without
  one the frame lands in a module registry, and the first time the
  registry crosses ``WARN_AT`` frames a single ``RuntimeWarning``
  names the accumulating operators and the fix.
- ``release_tracked()`` — unpersists and clears the registry (the
  per-batch call for drivers that use the raw operators without
  sinks); re-arms the warning.

One-shot jobs never see the warning (a handful of frames, process
exits); the 100-batch stream that used to leak warns on batch ~8.
"""

from __future__ import annotations

import warnings

from pyspark import StorageLevel
from pyspark.sql import DataFrame

WARN_AT = 8

_TRACKED: list[tuple[str, DataFrame, int | None]] = []
_warned = False


def track_persist(
    df: DataFrame,
    operator: str,
    cache_sink: list | None = None,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``df`` and route its lifetime: to ``cache_sink`` when the
    caller took ownership, else to the module registry (loud past
    ``WARN_AT`` frames). Returns the persisted frame."""
    global _warned
    p = df.persist(level)
    if cache_sink is not None:
        cache_sink.append(p)
        return p
    # A re-run of the same operator over the same inputs builds a fresh
    # DataFrame whose plan the CacheManager resolves to the ALREADY
    # cached relation (the persist() above is then a no-op). Registering
    # it again would multi-count one physical cache entry toward WARN_AT
    # — a bench rep loop over a persisting query would warn on phantom
    # accumulation inside the timed region. Exact-plan dedup
    # (sameSemantics == Catalyst sameResult, no false positives) keeps
    # the registry 1:1 with physical cache entries; genuinely new plans
    # (e.g. per-batch frames in a stream) still accumulate and warn.
    try:
        h = p.semanticHash()
        for _, existing, eh in _TRACKED:
            if eh == h and p.sameSemantics(existing):
                return p
    except Exception:
        h = None  # plan not hashable — track unconditionally
    _TRACKED.append((operator, p, h))
    if len(_TRACKED) >= WARN_AT and not _warned:
        _warned = True
        ops = sorted({name for name, _, _ in _TRACKED})
        warnings.warn(
            f"{len(_TRACKED)} operator-internal cached frames have "
            f"accumulated without a cache_sink (operators: {ops}). On a "
            "long-lived driver this grows without bound — pass cache_sink= "
            "and unpersist after materializing, or call "
            "erpl_web_spark.operators.release_tracked() between batches.",
            RuntimeWarning,
            stacklevel=3,
        )
    return p


def release_tracked() -> int:
    """Unpersist every registry-tracked frame, clear the registry,
    re-arm the accumulation warning. Returns the number released."""
    global _warned
    n = len(_TRACKED)
    for _, df, _ in _TRACKED:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing left to release
    _TRACKED.clear()
    _warned = False
    return n


def tracked_count() -> int:
    return len(_TRACKED)
