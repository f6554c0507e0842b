"""Z-order (Morton-curve) clustering for multi-dimension file skipping.

Why: a lake table sorted by one column prunes scans on THAT column only —
at 100 TB a predicate on the second clustering dimension reads every file.
Interleaving the bits of several dimensions' bucket ranks yields a layout
where every clustered dimension gets usable per-file min/max ranges, so
parquet/Iceberg stats skip files for predicates on ANY of them (the
``OPTIMIZE ZORDER BY`` idea from the Delta/Iceberg world, built here from
plain DataFrame ops).

Mechanics (all JVM-side expressions, one tiny driver-side bounds job):

1. each dimension maps to a ``bits``-wide integer rank: numerics are
   min/max-scaled; strings rank by their first-7-byte big-endian prefix
   (preserves lexicographic order, fits a long);
2. ranks interleave bit-by-bit into the Morton value ``z``;
3. ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` lays rows out
   in contiguous z-ranges — one range-exchange, the same shuffle shape a
   plain global sort costs.

The bounds job is one ``agg(min, max, …)`` over the clustering columns —
O(columns) driver memory, no collect of data rows.  At 100 TB the write
itself is the cost; the extra exchange is the one you were already paying
to lay files out.

Reference: the reference engine has no layout optimizer (single-node,
SURVEY.md §4); this extends the lake-maintenance family (§9 compaction /
rebucketing rows).
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue", "cluster_by"]

Z_COLUMN = "_zvalue"

_STRING_PREFIX_BYTES = 7  # 56 bits — fits a signed long without overflow


def _prefix_long(c: Column, skip_chars: int = 0) -> Column:
    """Big-endian integer of the first 7 UTF-8 bytes after skipping
    ``skip_chars`` leading characters: order-preserving (UTF-8 byte order
    follows code-point order), cheap, bounded (< 2^56).  ``skip_chars``
    strips the table-wide common prefix — keys like ``repo-0000…`` differ
    only past it, and without the strip every row would rank 0."""
    cut = F.substring(c, skip_chars + 1, _STRING_PREFIX_BYTES)
    hexed = F.hex(F.substring(cut.cast("binary"), 1, _STRING_PREFIX_BYTES))
    # right-pad to full width so 'a' < 'a0' keeps prefix order after conv
    padded = F.rpad(hexed, _STRING_PREFIX_BYTES * 2, "0")
    return F.conv(padded, 16, 10).cast("long")


def _py_prefix_long(s: str, skip_chars: int = 0) -> int:
    """Driver-side mirror of :func:`_prefix_long` (same cut, same pad)."""
    b = s[skip_chars:skip_chars + _STRING_PREFIX_BYTES].encode("utf-8")
    b = b[:_STRING_PREFIX_BYTES]
    return int.from_bytes(b.ljust(_STRING_PREFIX_BYTES, b"\x00"), "big")


def _lcp_len(a: str, b: str) -> int:
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    return i


def _dim_rank(c: Column, dtype: str, lo: Column, hi: Column, bits: int) -> Column:
    """Scale a column into [0, 2^bits) given its (lo, hi) bounds."""
    buckets = 1 << bits
    v = c.cast("double")
    lo_d, hi_d = lo.cast("double"), hi.cast("double")
    span = hi_d - lo_d
    scaled = F.when(span <= 0, F.lit(0)).otherwise(
        F.floor((v - lo_d) / (span + 1e-12) * F.lit(buckets))
    )
    return F.least(F.greatest(scaled.cast("long"), F.lit(0)), F.lit(buckets - 1))


def _interleave(ranks: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of dim d lands at position i*ndims + d."""
    ndims = len(ranks)
    terms = []
    for d, r in enumerate(ranks):
        for i in range(bits):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * ndims + d))
    return functools.reduce(lambda a, b: a.bitwiseOR(b), terms)


def zvalue(df: DataFrame, cols: list[str], bits: int = 8) -> tuple[DataFrame, str]:
    """Attach the Morton value column for ``cols``.  Returns (df, colname).

    One bounds job runs now (min/max per dimension, strings via the
    order-preserving 7-byte prefix); everything else is deferred column
    arithmetic inside whole-stage codegen.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    if bits * len(cols) > 63:
        # bit i*ndims+d must stay below the long's sign bit or the top
        # Morton bit flips z negative and range-partitioning misorders it
        raise ValueError(
            f"bits*ndims = {bits * len(cols)} exceeds 63 — lower bits "
            f"(≤{63 // len(cols)} for {len(cols)} dims) or cluster fewer columns"
        )
    dtypes = dict(df.dtypes)
    for c in cols:
        if c not in dtypes:
            raise ValueError(f"unknown column {c!r}")
    # ONE bounds job: min/max of the raw column per dimension.  For string
    # dims the common prefix of (min, max) is the common prefix of every
    # value, so the driver derives the prefix-strip and the integer bounds
    # from the same two strings — no second pass.
    bounds_row = df.agg(
        *[F.min(c).alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    ranks = []
    for i, c in enumerate(cols):
        lo_v, hi_v = bounds_row[f"lo_{i}"], bounds_row[f"hi_{i}"]
        if dtypes[c] == "string":
            lo_s = lo_v if lo_v is not None else ""
            hi_s = hi_v if hi_v is not None else ""
            skip = _lcp_len(lo_s, hi_s)
            pre = _prefix_long(F.col(c), skip)
            lo, hi = F.lit(_py_prefix_long(lo_s, skip)), F.lit(_py_prefix_long(hi_s, skip))
        else:
            pre = F.col(c)
            lo, hi = F.lit(lo_v), F.lit(hi_v)
        ranks.append(_dim_rank(pre, dtypes[c], lo, hi, bits))
    return df.withColumn(Z_COLUMN, _interleave(ranks, bits)), Z_COLUMN


def cluster_by(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``df`` laid out in contiguous Morton ranges over ``cols``:
    write the result and every clustered dimension prunes by file-level
    min/max stats.  ``num_partitions=None`` leaves the count to
    ``spark.sql.shuffle.partitions`` + AQE (right at any scale; a fixed
    count is wrong at one of them)."""
    z, zc = zvalue(df, cols, bits)
    parted = (
        z.repartitionByRange(num_partitions, F.col(zc))
        if num_partitions is not None
        else z.repartitionByRange(F.col(zc))
    )
    return parted.sortWithinPartitions(zc).drop(zc)
