"""Computation reuse via content-hash cache join (SURVEY.md §2.3 J6, §4 P5/P7).

The reference caches its expensive NLP conversion keyed by
(path_rel, contentHash) and recomputes only on miss
(loadCachedNlpFromDetalhes, sharepoint.ts:269-283), with the source's
quickXorHash as a cheap change-detection pre-filter (sharepoint.ts:617).

Spark shape: left-join the incoming batch against a prior-results table on
the cache key; rows that hit reuse the cached columns, misses run the
expensive stage; union the two.  At 100 TB this is the difference between
re-extracting the whole corpus per epoch and extracting only changed
content — the cache table is keyed by a uniform hash, so the join is
skew-free and AQE picks broadcast vs shuffled by the cache's actual size.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reuse_cached(
    batch: DataFrame,
    cache: DataFrame,
    key_cols: list[str],
    cached_cols: list[str],
    compute: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Split ``batch`` into cache hits and misses on ``key_cols``; hits take
    ``cached_cols`` from ``cache``, misses go through ``compute`` (which must
    add exactly ``cached_cols``).  Returns hits ∪ computed-misses."""
    c = cache.select(*key_cols, *cached_cols).dropDuplicates(key_cols)
    hits = batch.join(c, key_cols, "inner")
    misses = batch.join(c.select(*key_cols), key_cols, "left_anti")
    computed = compute(misses)
    return hits.unionByName(computed.select(*hits.columns))


def changed_only(
    batch: DataFrame,
    target: DataFrame,
    key_cols: list[str],
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Cheap change-detection pre-filter (X12/P7): drop batch rows whose key
    exists in the target with the SAME content fingerprint — their expensive
    re-processing would be a no-op.  Anti-join on (key, fingerprint)."""
    t = target.select(*key_cols, fingerprint_col).dropDuplicates(key_cols)
    return batch.join(t, [*key_cols, fingerprint_col], "left_anti")
