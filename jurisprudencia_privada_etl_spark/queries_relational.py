"""Relational-completeness query family (round 4 widening).

Nine additional oracle-paired driver queries that close the remaining
"generic analytics over the same tables" surface a user of the reference
engine would expect from a drop-in replacement (SURVEY.md §2.4-§2.6
families, plus the LLM-pipeline chunking op from the round brief):

* ``interval_range_join``   — point-in-interval join via the bucketed
  range-join operator (operators/temporal.interval_join), the shape Spark
  would otherwise plan as a broadcast-nested-loop.
* ``pivot_counts``          — wide pivot (groupBy().pivot()) vs FILTER aggs.
* ``grouping_sets_counts``  — GROUPING SETS with grouping-id disambiguation.
* ``histogram_bins``        — fixed-width numeric histogram.
* ``set_ops_users``         — INTERSECT / EXCEPT / UNION with set semantics.
* ``salted_hot_key_agg``    — two-stage salted aggregation over a Zipf-hot
  key, bit-identical to the naive group-by (the skew-mitigation invariant).
* ``percentile_disc``       — discrete p50/p90/p99 by rank selection (no
  interpolation arithmetic, so doubles hash-match across engines).
* ``dup_tolerant_replay``   — LWW convergence under an at-least-once
  source: the changelog unioned with a re-delivered slice of itself must
  converge to the same state as the exactly-once oracle.
* ``chunk_documents``       — overlapping fixed-size training windows over
  document text (sequence+explode+substring, all JVM-side).

Every query aliases output columns identically to its DuckDB oracle and
avoids floating-point accumulation (counts, rank-selected values, or
integer sums only) so the driver's value-hash compare is stable.

Reference parity notes: the reference has no generic OLAP surface (it is a
single-purpose ETL, SURVEY.md §2.4), so these queries cite the *family*
rows they extend rather than reference file:lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.tables import read_table

from jurisprudencia_privada_etl_spark.operators.lww import lww_dedup
from jurisprudencia_privada_etl_spark.operators.temporal import interval_join


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# interval / range join (J-family extension)
# ---------------------------------------------------------------------------

def q_interval_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-style point-in-interval join: clicks landing inside the
    two-hour window after any signup by the same user.  Runs through
    ``interval_join``'s bucket-exploded equi-join (shuffle key =
    (user, hour-bucket)) rather than the naive theta join DuckDB uses —
    same pairs, scale-safe plan."""
    e = _t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    signups = (
        e.where(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
            F.col("event_id").alias("signup_id"),
        )
    )
    pairs = interval_join(
        clicks, signups, on="user_id", left_ts="ts",
        right_start="w_start", right_end="w_end", bucket_seconds=3600,
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("event_id").alias("n_clicks"),
        F.countDistinct("signup_id").alias("n_signups"),
    )


SQL_INTERVAL_RANGE_JOIN = """
SELECT c.user_id,
       COUNT(*)                    AS n_pairs,
       COUNT(DISTINCT c.event_id)  AS n_clicks,
       COUNT(DISTINCT s.event_id)  AS n_signups
FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup') s
  ON c.user_id = s.user_id
 AND c.ts BETWEEN s.ts AND s.ts + INTERVAL 2 HOUR
GROUP BY c.user_id
"""


# ---------------------------------------------------------------------------
# pivot (A-family extension)
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide daily activity matrix: one row per day-of-month, one count
    column per event type.  The explicit value list keeps the pivot a
    single pass (no extra distinct job) and pins the output schema."""
    e = _t(spark, sf_dir, "events")
    piv = (
        e.groupBy(F.dayofmonth("ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    return piv.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in _EVENT_TYPES],
    )


SQL_PIVOT_COUNTS = """
SELECT EXTRACT(day FROM ts)::BIGINT AS day,
       count(*) FILTER (WHERE event_type = 'click')    AS n_click,
       count(*) FILTER (WHERE event_type = 'error')    AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       count(*) FILTER (WHERE event_type = 'view')     AS n_view
FROM events
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# grouping sets (A-family extension)
# ---------------------------------------------------------------------------

def q_grouping_sets_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS over orders with a grouping-id column so subtotal rows
    are unambiguous even where a key value could itself be NULL.  Money is
    summed in integer cents (round-then-cast) to keep the hash stable."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT)
                   AS gid,
               COUNT(*) AS n_orders,
               SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """)


SQL_GROUPING_SETS_COUNTS = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


# ---------------------------------------------------------------------------
# histogram (A-family extension)
# ---------------------------------------------------------------------------

def q_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of lineitem extended price (1000-unit bins).
    floor(x / 1000) is one IEEE divide + floor in both engines, so bin
    assignment is bit-identical; counts are exact."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.floor(F.col("l_extendedprice") / F.lit(1000.0)).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_HISTOGRAM_BINS = """
SELECT CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS bin, COUNT(*) AS n
FROM lineitem GROUP BY 1
"""


# ---------------------------------------------------------------------------
# set operations (O-family extension)
# ---------------------------------------------------------------------------

def q_set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION with set (distinct) semantics over user
    populations, tagged so one result carries all three."""
    e = _t(spark, sf_dir, "events")
    clickers = e.where(F.col("event_type") == "click").select("user_id")
    buyers = e.where(F.col("event_type") == "purchase").select("user_id")
    both = clickers.intersect(buyers).select(F.lit("both").alias("cohort"), "user_id")
    only_click = clickers.subtract(buyers).select(
        F.lit("click_only").alias("cohort"), "user_id"
    )
    either = clickers.union(buyers).distinct().select(
        F.lit("either").alias("cohort"), "user_id"
    )
    return both.unionByName(only_click).unionByName(either)


SQL_SET_OPS_USERS = """
SELECT 'both' AS cohort, user_id FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase')
UNION ALL
SELECT 'click_only' AS cohort, user_id FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase')
UNION ALL
SELECT 'either' AS cohort, user_id FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'purchase')
"""


# ---------------------------------------------------------------------------
# salted hot-key aggregation (§4 P9 skew invariant, query-level)
# ---------------------------------------------------------------------------

def q_salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over the Zipf-hot ``repo`` key of the
    derived changelog (13 distinct repos — every one a hot key at scale).
    Stage 1 aggregates on (repo, salt) so no single task owns a whole hot
    key; stage 2 folds the ≤ n_salts partials per repo.  The invariant the
    oracle pins: salting must not change any aggregate value
    (tests/test_salting.py proves the same for the replay path)."""
    from jurisprudencia_privada_etl_spark.queries import derived_changelog

    log = derived_changelog(spark, sf_dir)
    n_salts = 16
    salted = log.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("ordinal")), F.lit(n_salts))
    )
    partial = salted.groupBy("repo", "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("ordinal").alias("_sum_ord"),
        F.max("ordinal").alias("_max_ord"),
        F.countDistinct("path").alias("_n_paths"),  # upper-bound partial
    )
    # countDistinct does not decompose across salts; recompute it unsalted
    # (cheap: 13 groups) and join — the salted stages carry the heavy sums.
    exact_paths = log.groupBy("repo").agg(F.countDistinct("path").alias("n_paths"))
    folded = partial.groupBy("repo").agg(
        F.sum("_n").alias("n_events"),
        F.sum("_sum_ord").alias("sum_ordinal"),
        F.max("_max_ord").alias("max_ordinal"),
    )
    return folded.join(F.broadcast(exact_paths), "repo")


SQL_SALTED_HOT_KEY_AGG = """
WITH changelog AS (
    SELECT
        event_id                                              AS ordinal,
        'r' || CAST(user_id % 13 AS VARCHAR)                  AS repo,
        'src/f' || CAST(event_id % 297 AS VARCHAR) || '.py'   AS path
    FROM events
)
SELECT repo,
       COUNT(*)              AS n_events,
       SUM(ordinal)          AS sum_ordinal,
       MAX(ordinal)          AS max_ordinal,
       COUNT(DISTINCT path)  AS n_paths
FROM changelog GROUP BY repo
"""


# ---------------------------------------------------------------------------
# discrete percentiles (W-family extension)
# ---------------------------------------------------------------------------

_PCTS = [0.5, 0.9, 0.99]


def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete p50/p90/p99 of event value per event type by rank
    selection: the value at row ceil(p*n) of the (value, event_id)-sorted
    partition.  No interpolation arithmetic → the selected doubles are
    source values and hash-match across engines (percentile_cont's
    ``(1-f)*a + f*b`` would not)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    ranked = e.select(
        "event_type", "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    ps = F.explode(F.array(*[F.lit(p) for p in _PCTS])).alias("p")
    return (
        ranked.select("event_type", "value", "rn", "n", ps)
        .where(F.col("rn") == F.greatest(F.lit(1), F.ceil(F.col("p") * F.col("n"))))
        .select("event_type", "p", F.col("value").alias("pct_value"))
    )


SQL_PERCENTILE_DISC = """
WITH ranked AS (
    SELECT event_type, value,
           row_number() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rn,
           COUNT(*)    OVER (PARTITION BY event_type) AS n
    FROM events
)
SELECT event_type, CAST(p AS DOUBLE) AS p, value AS pct_value
FROM ranked CROSS JOIN (VALUES (0.5), (0.9), (0.99)) ps(p)
WHERE rn = greatest(1, CAST(ceil(p * n) AS BIGINT))
"""


# ---------------------------------------------------------------------------
# at-least-once duplicate tolerance (T-family extension, query-level)
# ---------------------------------------------------------------------------

def q_dup_tolerant_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LWW convergence under an at-least-once source: the derived changelog
    UNION ALL a re-delivered third of itself (every ordinal ≡ 0 mod 3)
    must converge to exactly the exactly-once state — re-delivered events
    carry the same ordinal, so the LWW reduce absorbs them.  The oracle is
    the plain exactly-once state: equality IS the idempotence proof."""
    from jurisprudencia_privada_etl_spark.queries import derived_changelog

    log = derived_changelog(spark, sf_dir)
    redelivered = log.where(F.pmod(F.col("ordinal"), F.lit(3)) == 0)
    at_least_once = log.unionByName(redelivered)
    state = lww_dedup(at_least_once, ["repo", "path"], "ordinal").where(
        F.col("op") != "D"
    )
    return state.select(
        "repo", "path", "ordinal",
        F.sha2(F.col("content"), 256).alias("content_sha"),
    )


def _sql_dup_tolerant(changelog_cte: str) -> str:
    return f"""
WITH {changelog_cte},
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY ordinal DESC) AS rn
    FROM changelog
)
SELECT repo, path, ordinal, sha256(content) AS content_sha
FROM ranked WHERE rn = 1 AND op <> 'D'
"""


# ---------------------------------------------------------------------------
# document chunking (LLM-pipeline family)
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 400
_CHUNK_STRIDE = 300


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size training windows over document text (size 400
    chars, stride 300): sequence → explode → substring, all JVM-side
    whole-stage-codegen — the canonical pre-tokenization chunker.  Chunk
    identity is (doc_id, chunk_idx); content is pinned by md5."""
    d = _t(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length("text") - 1, F.lit(0)),
        F.lit(_CHUNK_STRIDE),
    )
    return (
        d.select("doc_id", "text", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / F.lit(_CHUNK_STRIDE)).cast("long").alias("chunk_idx"),
            F.substring(F.col("text"), F.col("start") + 1, F.lit(_CHUNK_SIZE)).alias("_c"),
        )
        .select(
            "doc_id", "chunk_idx",
            F.length("_c").cast("long").alias("chunk_len"),
            F.md5(F.col("_c")).alias("chunk_md5"),
        )
    )


SQL_CHUNK_DOCUMENTS = f"""
SELECT doc_id,
       CAST(start / {_CHUNK_STRIDE} AS BIGINT)            AS chunk_idx,
       CAST(length(substr(text, start + 1, {_CHUNK_SIZE})) AS BIGINT) AS chunk_len,
       md5(substr(text, start + 1, {_CHUNK_SIZE}))        AS chunk_md5
FROM (
    SELECT doc_id, text,
           unnest(generate_series(0, greatest(length(text) - 1, 0), {_CHUNK_STRIDE}))
               AS start
    FROM documents
)
"""


# ---------------------------------------------------------------------------
# deterministic sampling / dataset split (LLM-pipeline family)
# ---------------------------------------------------------------------------

def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by md5-range on doc_id: one hash
    per row, no shuffle, stable under repartitioning, identical in any
    engine with md5 (functions/sampling.py).  Output pins per-(lang, split)
    counts plus an identity sum so the exact membership is checked, not
    just the sizes."""
    from jurisprudencia_privada_etl_spark.functions.sampling import hash_split

    d = _t(spark, sf_dir, "documents")
    split = hash_split("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="split42")
    return (
        d.select("lang", split.alias("split"), "doc_id")
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("sum_ids"))
    )


def _sql_hash_split() -> str:
    from jurisprudencia_privada_etl_spark.functions.sampling import hex_threshold

    t80, t90 = hex_threshold(0.8), hex_threshold(0.9)
    return f"""
SELECT lang,
       CASE WHEN substr(md5('split42' || CAST(doc_id AS VARCHAR)), 1, 8) < '{t80}'
                 THEN 'train'
            WHEN substr(md5('split42' || CAST(doc_id AS VARCHAR)), 1, 8) < '{t90}'
                 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*)     AS n_docs,
       SUM(doc_id)  AS sum_ids
FROM documents GROUP BY 1, 2
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language 20% deterministic sample: the sample predicate is a
    row-local scan filter (pushdown-able), and sampling the same key with
    the same salt in another table keeps joins intact.  Output: per-lang
    total vs sampled counts + sampled identity sum."""
    from jurisprudencia_privada_etl_spark.functions.sampling import hash_hex, hex_threshold

    d = _t(spark, sf_dir, "documents")
    keep = hash_hex("doc_id", salt="s1") < F.lit(hex_threshold(0.2))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_sampled"),
        F.sum(F.when(keep, F.col("doc_id")).otherwise(0)).alias("sum_sampled_ids"),
    )


def _sql_stratified_sample() -> str:
    from jurisprudencia_privada_etl_spark.functions.sampling import hex_threshold

    t20 = hex_threshold(0.2)
    return f"""
SELECT lang,
       COUNT(*) AS n_total,
       SUM(CASE WHEN substr(md5('s1' || CAST(doc_id AS VARCHAR)), 1, 8) < '{t20}'
                THEN 1 ELSE 0 END) AS n_sampled,
       SUM(CASE WHEN substr(md5('s1' || CAST(doc_id AS VARCHAR)), 1, 8) < '{t20}'
                THEN doc_id ELSE 0 END) AS sum_sampled_ids
FROM documents GROUP BY lang
"""


def build_registry(changelog_cte: str):
    """(queries, oracles) for this family; the CTE comes from queries.py so
    the dup-tolerant oracle reuses the one authoritative derivation."""
    queries = {
        "interval_range_join": q_interval_range_join,
        "pivot_counts": q_pivot_counts,
        "grouping_sets_counts": q_grouping_sets_counts,
        "histogram_bins": q_histogram_bins,
        "set_ops_users": q_set_ops_users,
        "salted_hot_key_agg": q_salted_hot_key_agg,
        "percentile_disc": q_percentile_disc,
        "dup_tolerant_replay": q_dup_tolerant_replay,
        "chunk_documents": q_chunk_documents,
        "hash_split": q_hash_split,
        "stratified_sample": q_stratified_sample,
    }
    oracles = {
        "interval_range_join": SQL_INTERVAL_RANGE_JOIN,
        "pivot_counts": SQL_PIVOT_COUNTS,
        "grouping_sets_counts": SQL_GROUPING_SETS_COUNTS,
        "histogram_bins": SQL_HISTOGRAM_BINS,
        "set_ops_users": SQL_SET_OPS_USERS,
        "salted_hot_key_agg": SQL_SALTED_HOT_KEY_AGG,
        "percentile_disc": SQL_PERCENTILE_DISC,
        "dup_tolerant_replay": _sql_dup_tolerant(changelog_cte),
        "chunk_documents": SQL_CHUNK_DOCUMENTS,
        "hash_split": _sql_hash_split(),
        "stratified_sample": _sql_stratified_sample(),
    }
    return queries, oracles
