"""Deterministic hash-based sampling and dataset splitting.

A training-data pipeline needs samples and train/val/test splits that are
(a) reproducible run-to-run and engine-to-engine, (b) computable row-local
(no shuffle, no global count), and (c) stable under repartitioning —
``df.sample()`` satisfies none of these (seeded per-partition RNG changes
with partitioning).  The standard fix: hash a stable key and threshold.

Engine-portability detail: the hash is the first 8 hex chars of
``md5(key)`` compared LEXICOGRAPHICALLY against hex thresholds.  Lowercase
hex compares like the number it encodes, so no hex→int conversion is
needed — the same ``substr(md5(x),1,8) < ':threshold'`` predicate runs
verbatim in Spark, DuckDB, or any engine with md5, which is what makes the
driver oracle an exact pair (queries_relational.q_hash_split).

Reference: the reference ETL has no sampling surface (single-purpose
batch, SURVEY.md §2); this extends the LLM-pipeline family mandated by
the round brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_hex", "hex_threshold", "deterministic_sample", "hash_split"]

_HEX_SPACE = 16 ** 8  # first 8 md5 hex chars ≈ uniform on [0, 16^8)


def hash_hex(col: Column | str, salt: str = "") -> Column:
    """First 8 hex chars of md5(salt ++ key) — a uniform draw encoded so
    that string order == numeric order.  ``salt`` decorrelates independent
    samples/splits taken over the same key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8)


def hex_threshold(fraction: float) -> str:
    """The 8-hex-char threshold t such that P[hash_hex < t] == fraction
    (up to 1/16^8).  Exported so oracles can embed the same literal."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * _HEX_SPACE), _HEX_SPACE - 1), "08x")


def deterministic_sample(
    df: DataFrame, key: Column | str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash: row-local (a scan
    filter, pushable), reproducible, and consistent across tables — two
    tables sampled on the same key keep the SAME keys, so sampled fact
    and dim tables still join."""
    return df.where(hash_hex(key, salt) < F.lit(hex_threshold(fraction)))


def hash_split(
    key: Column | str,
    fractions: dict[str, float],
    salt: str = "",
) -> Column:
    """Label each row with a split name by hash range.  ``fractions`` maps
    name → fraction (must sum to 1.0); ranges are assigned in dict order.
    One md5 per row, no shuffle, stable under any partitioning."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    h = hash_hex(key, salt)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = h < F.lit(hex_threshold(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)
