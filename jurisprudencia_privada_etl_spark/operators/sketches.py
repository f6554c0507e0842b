"""KMV (k-minimum-values) distinct-count sketches — deterministic,
engine-portable cardinality estimation.

Why not ``approx_count_distinct``: Spark's HLL++ is fine on a real
cluster, but its estimates are implementation-defined — no other engine
reproduces them, so they can't be oracle-checked, merged across engines,
or regression-pinned byte-for-byte.  KMV is the textbook alternative
(Bar-Yossef et al. 2002): hash every value with a fixed uniform hash,
keep the k smallest distinct hashes per group, and estimate
``(k-1) * domain / kth_smallest``.  Everything is integer arithmetic on a
deterministic hash, so ANY engine computing the same hash gets the
bit-identical estimate — which is exactly what the driver's DuckDB oracle
does (queries.py ``kmv_distinct``).

Scale shape (100 TB): stage 1 is ``distinct(group, hash)`` — a hash
aggregate with map-side partial combine, so each executor emits at most
its local distinct set and the shuffle carries distinct hashes, not rows.
Stage 2 ranks hashes per group; the window streams over sorted
already-distinct values (never the raw rows).  Sketch vectors
(``kmv_sketch``) are bounded at k longs per group, so they broadcast /
union / merge for free — mergeability is the other reason real pipelines
carry KMV/HLL rather than exact sets.

Standard error ~ 1/sqrt(k): k=256 → ~6%, k=1024 → ~3%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "kmv_hash_sha2",
    "kmv_hash_poly",
    "kmv_distinct",
    "kmv_sketch",
    "kmv_union_estimate",
    "quantile_sketch",
    "quantile_estimate",
    "quantile_union",
]

#: domain of kmv_hash_sha2 — 13 hex digits = 2^52, exact in a long AND a double
SHA2_DOMAIN = 16**13
#: domain of kmv_hash_poly
POLY_DOMAIN = 2**32


def kmv_hash_sha2(col: Column) -> Column:
    """Uniform hash in [0, 16^13) from the first 13 hex digits of sha256.

    JVM-side (sha2 + conv are codegen'd), works on arbitrary values via a
    canonical string cast.  Use with ``domain=SHA2_DOMAIN``.
    """
    return F.conv(F.substring(F.sha2(col.cast("string"), 256), 1, 13), 16, 10).cast("long")


def kmv_hash_poly(col: Column, mult: int = 1_000_003, domain: int = POLY_DOMAIN) -> Column:
    """Multiplicative integer hash ``(col * mult) % domain`` for integer
    keys.  Weaker mixing than sha2 but expressible as plain arithmetic in
    ANY SQL engine — the oracle-pairing variant.  ``col * mult`` must fit
    a signed 64-bit long: keep ``col < 2**63 / mult`` (document inputs or
    pre-mod them).
    """
    return F.pmod(col.cast("long") * F.lit(mult), F.lit(domain)).cast("long")


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    hash_col: Column,
    k: int = 256,
    domain: int = SHA2_DOMAIN,
) -> DataFrame:
    """Per-group distinct-count estimate from the k minimum hash values.

    Returns one row per group: ``n_kept`` (distinct hashes retained,
    < k means the group was exact), ``kth_hash`` (the largest retained
    hash), and ``distinct_est`` — exact ``n_kept`` when the group has
    fewer than k distinct values, else ``(k-1) * domain div kth_hash``
    (integer floor division: deterministic, no float summation anywhere).
    """
    d = df.select(*group_cols, hash_col.alias("_h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    topk = d.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return topk.groupBy(*group_cols).agg(
        F.count("*").alias("n_kept"),
        F.max("_h").alias("kth_hash"),
        F.when(F.count("*") < k, F.count("*"))
        .otherwise(F.expr(f"({k} - 1) * cast({domain} as bigint) div max(_h)"))
        .cast("long")
        .alias("distinct_est"),
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    hash_col: Column,
    k: int = 256,
) -> DataFrame:
    """Materialize the sketch itself: per group, the sorted array of its
    ≤k smallest distinct hashes (``kmv`` column, array<long> bounded at k
    elements — safe to collect_list because the rank filter ran first).
    Sketches are mergeable: see :func:`kmv_union_estimate`.
    """
    d = df.select(*group_cols, hash_col.alias("_h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    topk = d.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return topk.groupBy(*group_cols).agg(F.sort_array(F.collect_list("_h")).alias("kmv"))


def kmv_union_estimate(
    a: DataFrame, b: DataFrame, on: list[str], k: int, domain: int = SHA2_DOMAIN
) -> DataFrame:
    """Distinct-count estimate of the UNION of two sketched datasets
    without touching either's raw rows: outer-join the sketches on the
    group key, merge the hash arrays (union-distinct, re-sort, re-cap at
    k), and estimate as in :func:`kmv_distinct`.  This is the cross-table
    / cross-day rollup path — union cardinality from k-long summaries.
    """
    merged = (
        a.withColumnsRenamed({"kmv": "_ka"})
        .join(b.withColumnsRenamed({"kmv": "_kb"}), on=on, how="full")
        .withColumn(
            "_m",
            F.slice(
                F.array_sort(
                    F.array_distinct(
                        F.concat(
                            F.coalesce("_ka", F.array().cast("array<long>")),
                            F.coalesce("_kb", F.array().cast("array<long>")),
                        )
                    )
                ),
                1,
                k,
            ),
        )
    )
    n = F.size("_m")
    kth = F.element_at("_m", -1)
    return merged.select(
        *on,
        n.alias("n_kept"),
        F.when(n < k, n.cast("long"))
        .otherwise(F.expr(f"cast({(k - 1) * domain} as bigint) div element_at(_m, -1)"))
        .alias("distinct_est"),
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketch — deterministic bottom-k-by-hash row sample.
#
# The quantile companion to KMV, built on the same exactness-of-bottom-k
# property: the k rows with the smallest hash(key) form a uniform random
# sample of the group (the hash is the randomness, so it is deterministic
# and engine-portable), and the bottom-k of a UNION is computable from the
# two bottom-k sets alone — which is what makes the sketch mergeable
# across partitions / days / tables without touching raw rows again.
# Quantile estimates are rank selections over the sample's values: exact
# when the group has <= k rows, ~O(1/sqrt(k)) error otherwise, and always
# an actually-occurring value (percentile_disc semantics — no
# interpolation arithmetic to drift across engines).
# Unlike t-digest / KLL (Dunning 2019, Karnin et al. 2016 — the
# variance-optimal upgrades on a real cluster), every number here is
# reproducible bit-for-bit by ANY ANSI engine, so estimates can be
# oracle-checked and regression-pinned (queries.py `sketch_quantiles`).


def quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    hash_col: Column,
    k: int = 256,
) -> DataFrame:
    """Per-group quantile sketch: ``qsk`` = the (hash, value) pairs of the
    k minimum-hash rows, sorted by hash, plus ``n_sample``.

    ``hash_col`` must hash a ROW-UNIQUE key (e.g. ``kmv_hash_sha2
    (F.col("event_id"))``) — hashing the value itself would collapse
    duplicates and bias the sample.  Deterministic under hash collisions:
    rank order is (hash, value).
    """
    s = df.select(
        *group_cols, hash_col.alias("h"), F.col(value_col).alias("v")
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc(), F.col("v").asc())
    topk = s.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return topk.groupBy(*group_cols).agg(
        F.count("*").alias("n_sample"),
        F.sort_array(F.collect_list(F.struct("h", "v"))).alias("qsk"),
    )


def quantile_estimate(sketch: DataFrame, on: list[str], qs: list[float]) -> DataFrame:
    """Rank-select each requested quantile from the sketch sample: the
    value at ``row_number == max(1, ceil(q * n_sample))`` ordered by
    (value, hash).  Returns one row per (group, q): ``(…on, q, value)``."""
    e = sketch.select(
        *on, F.col("n_sample").alias("_n"), F.explode("qsk").alias("_e")
    ).select(*on, "_n", F.col("_e.h").alias("_h"), F.col("_e.v").alias("_v"))
    w = Window.partitionBy(*on).orderBy(F.col("_v").asc(), F.col("_h").asc())
    ranked = e.withColumn("_rn", F.row_number().over(w))
    qcol = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    return (
        ranked.select(*on, "_n", "_rn", "_v", qcol)
        .where(F.col("_rn") == F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("_n"))))
        .select(*on, "q", F.col("_v").alias("value"))
    )


def quantile_union(a: DataFrame, b: DataFrame, on: list[str], k: int) -> DataFrame:
    """Merge two quantile sketches without raw rows: full-outer join on the
    group key, concat the (hash, value) arrays, re-sort by hash, re-cap at
    k — exactly the bottom-k of the union, so the merged sketch equals the
    sketch that a single pass over the concatenated data would have built
    (property-tested).  ``n_sample`` is recomputed from the merged array."""
    empty = F.array().cast(a.schema["qsk"].dataType.simpleString())
    merged = (
        a.withColumnsRenamed({"qsk": "_qa"})
        .drop("n_sample")
        .join(b.withColumnsRenamed({"qsk": "_qb"}).drop("n_sample"), on=on, how="full")
        .withColumn(
            "qsk",
            F.slice(
                F.array_sort(
                    F.concat(F.coalesce("_qa", empty), F.coalesce("_qb", empty))
                ),
                1,
                k,
            ),
        )
    )
    return merged.select(*on, F.size("qsk").alias("n_sample"), "qsk")
