"""Session-aware memoization for persisted DataFrames and fitted models.

Round-1 ADVICE: module-level memo dicts keyed only by ``sf_dir`` held
persisted DataFrames bound to the *creating* SparkSession (stale handles
after an in-process session restart), and repeated calls re-persisted
semantically-equal plans (the ``Asked to cache already cached data``
warnings in BENCH_r01). All memoization now routes through this registry:

- keys include the ``SparkSession`` object itself, so a restarted session
  naturally misses and rebuilds;
- each logical plan is persisted exactly once per (session, key);
- ``clear_caches`` is the explicit unpersist hook (tests and long-lived
  drivers call it between datasets to release executor storage memory).

The registry holds strong references to its sessions — intentional: the
cached DataFrames are only valid while their session lives, and clearing
releases both.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, Any] = {}


def memo(
    spark: SparkSession,
    key: Any,
    build: Callable[[], Any],
    *,
    persist: bool = False,
    eager: bool = False,
) -> Any:
    """Build-once per (session, key). With ``persist=True`` the built
    DataFrame is ``.persist()``-ed (and with ``eager=True`` materialized
    immediately — do this only when consumers are concurrently-prepared
    broadcast subtrees, which recompute an unmaterialized cache)."""
    k = (spark, key)
    if k in _CACHE:
        return _CACHE[k]
    val = build()
    if persist:
        val = val.persist()
        if eager:
            val.count()
    _CACHE[k] = val
    return val


def _unpersist(val: Any) -> None:
    if isinstance(val, DataFrame):
        try:
            val.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    elif isinstance(val, tuple):
        for item in val:
            _unpersist(item)


def clear_caches(spark: SparkSession | None = None) -> int:
    """Unpersist and drop every memoized value (optionally only one
    session's). Returns the number of entries released."""
    n = 0
    for k in list(_CACHE):
        if spark is not None and k[0] is not spark:
            continue
        _unpersist(_CACHE.pop(k))
        n += 1
    return n
