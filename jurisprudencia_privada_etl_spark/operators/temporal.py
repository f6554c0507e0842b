"""Temporal joins & history operators: as-of join, SCD2 build, gap
sessionization, interval (range) join.

These are the time-dimension companions to the CDC core: a changelog sink
(plans/sink.py) answers "what is the state NOW / at version V", while the
operators here answer "what WAS true at each event's own timestamp"
(``asof_join``), "what validity interval did each version cover"
(``scd2_build``), "which events form one burst of activity"
(``sessionize``), and "which events fall inside which time window"
(``interval_join``).  The reference walks its changelog strictly in commit
order (sharepoint.ts:408 delta-token resume) and never re-derives
historical views; these operators are the Spark-first generalization of
that same ordered-changelog data model.

Scale design (the whole point of each implementation):

* ``asof_join`` uses the union+ordered-window trick — tag both inputs,
  union, ONE window over (key, ts) carrying the last right-side struct
  forward.  Exactly one shuffle, no join node at all, and never the
  quadratic (per-left-row scan of the right side) plan a naive
  ``l.ts >= r.ts`` theta join produces.  This is how stream processors
  (Flink temporal joins) do it; on 100 TB both sides shuffle once on the
  key and stream in ts order.
* ``scd2_build`` / ``sessionize`` are single-window plans: one shuffle on
  the entity key, then lead/lag arithmetic inside the sorted partition.
* ``interval_join`` equi-joins on (key, time-bucket) after exploding each
  interval into the buckets it covers — bounded fan-out of
  ``len/width + 1`` rows per interval instead of an unbounded theta join.
  Each matching pair materializes exactly once (the left row owns exactly
  one bucket), so no post-join dedup is needed.

Skew note: all four shuffle on the entity key; a pathological hot key gets
the same remedies as any window (AQE skew handling, or pre-splitting the
key's time range) — see operators/salting.py for the changelog-side
machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "scd2_build", "sessionize", "interval_join", "epoch_seconds"]


def epoch_seconds(c: Column) -> Column:
    """Timestamp → epoch seconds (long, truncated).  TIMESTAMP_NTZ (what
    plain parquet loads as) cannot cast directly to a number in Spark 4
    ANSI mode; routing through TIMESTAMP interprets the wall-clock in the
    session zone (UTC here — session.py pins it), matching DuckDB's
    ``epoch()``."""
    return c.cast("timestamp").cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance: Column | None = None,
    tie_break: str | None = None,
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the most recent right row with the same
    ``on`` key and ``right_ts <= left_ts`` (inclusive, "backward" as-of).

    Implementation: tag right rows 0 and left rows 1, union them on
    (key, ts, tag), and carry ``last(right-struct, ignorenulls)`` forward
    in one ordered window.  The right side's columns travel as a single
    struct so the matched attributes always come from ONE right row (a
    per-column ``last(ignorenulls)`` could stitch different rows together
    when right attributes contain nulls).

    ``tie_break``: right rows sharing (key, ts) are ordered by this column
    and the LAST one wins (max tie_break); without it ties are
    nondeterministic under shuffle, so supply one whenever right rows can
    collide on the timestamp.

    ``tolerance``: a Column interval/duration; matches older than
    ``left_ts - tolerance`` are nulled out (row is kept under
    ``how="left"``).  Expressed as ``matched_ts >= left_ts - tolerance``.

    ``how``: "left" keeps unmatched left rows with null right columns;
    "inner" drops them.

    Result columns: all of ``left``'s, plus ``right_cols`` (default: every
    right column except ``on``/``right_ts``), plus ``_asof_ts`` = the
    matched right timestamp.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")

    # right side: key, ts, and ONE struct holding everything we carry
    struct_fields = [F.col(right_ts).alias("_asof_ts")] + [F.col(c) for c in right_cols]
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_src"),
        (F.col(tie_break) if tie_break else F.lit(0)).alias("_tie"),
        F.struct(*struct_fields).alias("_r"),
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_src"),
        F.lit(None).cast(r.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r = r.withColumn("_l", F.lit(None).cast(l.schema["_l"].dataType))

    # right rows sort BEFORE left rows at the same ts (_src 0 < 1) so the
    # as-of is inclusive; _tie orders same-ts right rows (last = max wins).
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_src").asc(), F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        r.unionByName(l)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_src") == 1)
    )
    if tolerance is not None:
        merged = merged.withColumn(
            "_m",
            F.when(F.col("_m._asof_ts") >= F.col("_ts") - tolerance, F.col("_m")),
        )
    if how == "inner":
        merged = merged.where(F.col("_m").isNotNull())
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("_m._asof_ts").alias("_asof_ts"))
    out_cols += [F.col(f"_m.{c}").alias(c) for c in right_cols]
    return merged.select(*out_cols)


def scd2_build(
    df: DataFrame,
    key: str,
    ts: str,
    attrs: list[str] | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from versioned rows.

    Each (key, ts) row becomes a validity interval: ``valid_from`` = its
    own timestamp, ``valid_to`` = the NEXT version's timestamp (exclusive
    upper bound; null for the current version), plus ``version_no``
    (1-based per key) and ``is_current``.  ``asof_join``-ing a fact stream
    against the source rows is equivalent to a ``BETWEEN valid_from AND
    valid_to`` lookup against this table — materialize whichever shape the
    consumer wants.

    One shuffle (window on ``key``); ``tie_break`` disambiguates rows that
    share (key, ts), same contract as in :func:`asof_join`.
    """
    if attrs is None:
        attrs = [c for c in df.columns if c not in (key, ts)]
    order = [F.col(ts).asc()] + ([F.col(tie_break).asc()] if tie_break else [])
    w = Window.partitionBy(key).orderBy(*order)
    return df.select(
        F.col(key),
        *[F.col(c) for c in attrs],
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
        F.row_number().over(w).alias("version_no"),
        F.lead(ts).over(w).isNull().alias("is_current"),
    )


def sessionize(df: DataFrame, key: str, ts: str, gap_seconds: int) -> DataFrame:
    """Assign gap-based session ids: a new session starts whenever the time
    since the previous event of the same ``key`` exceeds ``gap_seconds``.

    Adds ``session_seq`` (1-based per key, in time order).  Classic
    lag → boundary-flag → running-sum plan: one shuffle on ``key``, all
    arithmetic inside the sorted partition.  (Structured Streaming's
    ``session_window`` is the streaming twin; this is the batch/backfill
    form that also gives per-event session attribution, which
    ``session_window`` 's aggregate-only API does not.)
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).asc())
    prev = F.lag(F.col(ts)).over(w)
    new_flag = (
        prev.isNull()
        | (epoch_seconds(F.col(ts)) - epoch_seconds(prev) > F.lit(gap_seconds))
    ).cast("int")
    running = Window.partitionBy(key).orderBy(F.col(ts).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_seq", F.sum(new_flag).over(running))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 86_400,
    how: str = "inner",
) -> DataFrame:
    """Join left rows (point events) to right rows (intervals) of the same
    key where ``right_start <= left_ts <= right_end`` (both inclusive).

    Scale path: explode each interval into the ``bucket_seconds``-wide
    time buckets it covers, bucket the left timestamp, and equi-join on
    (key, bucket) with the BETWEEN as a residual predicate.  The shuffle
    key is (key, bucket) — uniform as long as ``bucket_seconds`` is
    chosen near the typical interval length, and each matching pair
    appears exactly once because the left row owns exactly one bucket.
    A naive ``ON key AND ts BETWEEN ...`` join is what this replaces:
    Spark plans that as a broadcast-nested-loop or a per-key sort-merge
    with an unbounded range scan, both of which die at 100 TB.

    ``how``: "inner" (matched pairs) or "left" (unmatched left rows kept
    with null right columns — implemented as a second anti-join pass).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    b = F.lit(bucket_seconds)
    lb = left.withColumn("_b", F.floor(epoch_seconds(F.col(left_ts)) / b))
    rb = right.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(epoch_seconds(F.col(right_start)) / b),
                F.floor(epoch_seconds(F.col(right_end)) / b),
            )
        ),
    )
    joined = lb.join(
        rb,
        on=[
            lb["_b"] == rb["_b"],
            lb[on] == rb[on],
            lb[left_ts] >= rb[right_start],
            lb[left_ts] <= rb[right_end],
        ],
        how="inner",
    ).drop(rb[on]).drop(lb["_b"]).drop(rb["_b"])
    if how == "inner":
        return joined
    unmatched = lb.join(
        rb,
        on=[
            lb["_b"] == rb["_b"],
            lb[on] == rb[on],
            lb[left_ts] >= rb[right_start],
            lb[left_ts] <= rb[right_end],
        ],
        how="left_anti",
    ).drop("_b")
    for c in right.columns:
        if c != on:
            unmatched = unmatched.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    return joined.unionByName(unmatched)
