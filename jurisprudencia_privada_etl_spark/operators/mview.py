"""Incremental materialized-view maintenance over the change data feed.

The classic CDC-downstream consumer: a grouped aggregate of the lake table
(``SELECT group_cols, aggs FROM table GROUP BY group_cols``) kept current by
applying the row-level change feed instead of rescanning the base table —
the Gupta/Mumick self-maintainable-view construction re-expressed as two
DataFrame jobs per refresh.

Why it matters at 10^10 events: the base table is the big thing (100 TB);
an epoch's feed is O(changed rows) and the view is O(groups).  A delta
refresh costs one groupBy over the feed plus one join against the stored
view — it never touches base-table payload bytes.  ``count`` and ``sum``
(and anything derived from them: avg, ratios) are self-maintainable;
``min``/``max`` are not under deletes (the removed row may have BEEN the
minimum), so those views refresh by rescanning only the AFFECTED groups
(feed groups semi-join the base — at a 1% group touch rate that's 1% of the
scan, and the scan itself prunes to the grouping/aggregated columns).

Reference parity note: the reference has no view surface (its sink is a
remote search index); this family is part of the "what a lake engine at
this scale additionally needs" additions (SURVEY.md §8-§9), alongside the
change feed it consumes.

Exactness guardrails baked in:

* Every view carries a hidden live-row count ``_rows`` so a group whose
  last row is deleted is dropped (a plain delta-merge would leave a
  count=0 husk that a full recompute never produces).
* Every ``sum`` carries a hidden non-null count ``_nn_<name>`` so a group
  whose non-null values all disappear goes back to a NULL sum (0 would be
  wrong — SQL sums over zero non-null rows are NULL).
* Floating-point sums incrementally accumulate in a different order than a
  recompute; use integer/decimal columns for bit-exact parity (the driver
  queries do).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.operators.change_feed import (
    CHANGE_TYPE_COLUMN,
    change_feed,
)

ROWS_COL = "_rows"
SELF_MAINTAINABLE = ("count", "sum")
KINDS = ("count", "sum", "min", "max")

# spec: (output column name, kind, source column) — source column ignored
# for "count" (it counts live rows, not non-nulls; use sum over a 0/1
# projection for conditional counts).
Spec = tuple[str, str, str | None]


def _check(specs: list[Spec]) -> None:
    for name, kind, _col in specs:
        if kind not in KINDS:
            raise ValueError(f"unknown aggregate kind {kind!r} for {name!r} (have {KINDS})")
        if name.startswith("_"):
            raise ValueError(f"spec name {name!r} collides with hidden bookkeeping columns")


def _nn(name: str) -> str:
    return f"_nn_{name}"


def aggregate_view(state: DataFrame, group_cols: list[str], specs: list[Spec]) -> DataFrame:
    """Full compute of the view over a live state (one row per key).

    Emits the hidden ``_rows`` / ``_nn_*`` bookkeeping next to the declared
    aggregates; ``public_columns`` lists the caller-facing subset.
    """
    _check(specs)
    aggs = [F.count(F.lit(1)).alias(ROWS_COL)]
    for name, kind, col in specs:
        if kind == "count":
            aggs.append(F.count(F.lit(1)).alias(name))
        elif kind == "sum":
            aggs.append(F.sum(col).alias(name))
            aggs.append(F.count(col).alias(_nn(name)))
        elif kind == "min":
            aggs.append(F.min(col).alias(name))
        else:
            aggs.append(F.max(col).alias(name))
    return state.groupBy(*group_cols).agg(*aggs)


def public_columns(group_cols: list[str], specs: list[Spec]) -> list[str]:
    return [*group_cols, *[name for name, _k, _c in specs]]


def delta_from_feed(feed: DataFrame, group_cols: list[str], specs: list[Spec]) -> DataFrame:
    """Signed per-group aggregate delta from a change feed.

    One groupBy over the feed — O(changed rows), no base-table access.
    insert/update_postimage rows add, delete/update_preimage rows subtract
    (an update that moves a row between groups therefore decrements the old
    group and increments the new one).  The feed's delete rows MUST carry
    preimages (``change_feed(..., delete_image="preimage")`` or
    ``diff_states``): a tombstone image's payload is the delete event's, not
    the removed row's, and subtracting it would corrupt every sum.

    Only self-maintainable kinds (count/sum) are expressible as deltas;
    min/max views refresh through :func:`refresh_groups`.
    """
    _check(specs)
    bad = [name for name, kind, _c in specs if kind not in SELF_MAINTAINABLE]
    if bad:
        raise ValueError(
            f"specs {bad} are not self-maintainable under deletes; use refresh_groups()"
        )
    sign = F.when(
        F.col(CHANGE_TYPE_COLUMN).isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    aggs = [F.sum(sign).alias(ROWS_COL)]
    for name, kind, col in specs:
        if kind == "count":
            aggs.append(F.sum(sign).alias(name))
        else:
            aggs.append(F.sum(F.when(F.col(col).isNotNull(), sign * F.col(col))).alias(name))
            aggs.append(F.sum(F.when(F.col(col).isNotNull(), sign)).alias(_nn(name)))
    return feed.groupBy(*group_cols).agg(*aggs)


def apply_delta(view: DataFrame, delta: DataFrame, group_cols: list[str], specs: list[Spec]) -> DataFrame:
    """Merge a signed delta into a materialized view: one full-outer join on
    the group keys — O(groups), never O(table).  Groups whose live-row count
    reaches zero are dropped; sums whose non-null count reaches zero go back
    to NULL (recompute parity — see module docstring)."""
    _check(specs)
    hidden = [ROWS_COL] + [_nn(n) for n, k, _c in specs if k == "sum"]
    d = delta.select(
        *group_cols,
        *[F.col(c).alias(f"_d{c}") for c in [*hidden, *[n for n, _k, _c in specs]]],
    )
    j = view.join(d, on=group_cols, how="full_outer")

    def merged_long(cur: str, dlt: str) -> F.Column:
        return (
            F.coalesce(F.col(cur), F.lit(0)) + F.coalesce(F.col(dlt), F.lit(0))
        ).cast("long")

    out = [*[F.col(c) for c in group_cols], merged_long(ROWS_COL, f"_d{ROWS_COL}").alias(ROWS_COL)]
    for name, kind, _col in specs:
        if kind == "count":
            out.append(merged_long(name, f"_d{name}").alias(name))
        else:
            nn = merged_long(_nn(name), f"_d{_nn(name)}")
            out.append(nn.alias(_nn(name)))
            out.append(
                F.when(nn == 0, F.lit(None))
                .otherwise(
                    F.coalesce(F.col(name), F.lit(0)) + F.coalesce(F.col(f"_d{name}"), F.lit(0))
                )
                .cast(dict(view.dtypes)[name])
                .alias(name)
            )
    return j.select(*out).where(F.col(ROWS_COL) > 0)


def refresh_groups(
    view: DataFrame, feed: DataFrame, state: DataFrame, group_cols: list[str], specs: list[Spec]
) -> DataFrame:
    """Affected-group rescan — the refresh path for non-self-maintainable
    aggregates (min/max).  Groups named by any feed image (pre OR post, so
    group-moving updates hit both sides) are recomputed from the base state;
    untouched groups pass through from the stored view without a scan.  The
    base scan is a semi-join against O(feed) distinct groups and prunes to
    the grouping + aggregated columns, so at a 1% group touch rate it reads
    ~1% of a column subset, not the table."""
    _check(specs)
    affected = feed.select(*group_cols).distinct()
    recomputed = aggregate_view(
        state.join(affected, on=group_cols, how="left_semi"), group_cols, specs
    )
    kept = view.join(affected, on=group_cols, how="left_anti")
    return kept.unionByName(recomputed)


class MaterializedView:
    """Parquet-backed incremental view over a ``HadoopParquetSink`` table.

    The stored artifact is ``<path>/data-v{N}/`` (the view rows as written
    at sink version N, hidden bookkeeping included) plus ``<path>/_mview.json``
    (group columns, specs, synced version) published by atomic rename — the
    same crash-safety contract as the sink's own manifests: a refresh that
    dies mid-write leaves an orphan data dir and an unchanged view, and the
    next refresh redoes the same closed version window (exactly-once via
    the stamped ``synced version``; the feed between two committed versions
    is deterministic, so a redo writes identical rows).

    ``refresh()`` picks the cheapest correct path per the spec kinds:
    all-count/sum → :func:`delta_from_feed` + :func:`apply_delta` (no base
    access); any min/max → :func:`refresh_groups` (affected-groups rescan).
    Both consume ``change_feed(delete_image="preimage", on_vacuum="allow")``
    — preimage deletes don't read tombstone ordinals, so vacuum inside the
    refresh window is harmless here (the guard protects replication).
    """

    META = "_mview.json"

    def __init__(self, spark: SparkSession, sink, path: str):
        self.spark = spark
        self.sink = sink
        self.path = path

    # -- storage --------------------------------------------------------------

    def _meta(self) -> dict:
        with open(os.path.join(self.path, self.META)) as f:
            return json.load(f)

    def _publish(self, view: DataFrame, meta: dict) -> None:
        data = os.path.join(self.path, f"data-v{meta['synced_version']}")
        view.write.mode("overwrite").parquet(data)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.path, self.META))
        for d in os.listdir(self.path):
            if d.startswith("data-v") and d != os.path.basename(data):
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, self.META))

    @property
    def synced_version(self) -> int:
        return self._meta()["synced_version"]

    def df(self) -> DataFrame:
        """The view's caller-facing rows (bookkeeping hidden)."""
        m = self._meta()
        raw = self.spark.read.parquet(os.path.join(self.path, f"data-v{m['synced_version']}"))
        return raw.select(*public_columns(m["group_cols"], [tuple(s) for s in m["specs"]]))

    # -- lifecycle ------------------------------------------------------------

    def create(self, group_cols: list[str], specs: list[Spec]) -> dict:
        """Full compute at the sink's current version."""
        _check(specs)
        if self.exists():
            raise FileExistsError(f"materialized view already exists at {self.path}")
        os.makedirs(self.path, exist_ok=True)
        v = self.sink.manifest().version
        from jurisprudencia_privada_etl_spark.plans.sink import BUCKET_COLUMN

        state = self.sink.load(version=v).drop(BUCKET_COLUMN)
        view = aggregate_view(state, group_cols, specs)
        self._publish(view, {"synced_version": v, "group_cols": group_cols, "specs": specs})
        return {"mode": "full", "synced_version": v}

    def refresh(self) -> dict:
        """Advance the view to the sink's current version incrementally."""
        m = self._meta()
        group_cols = m["group_cols"]
        specs: list[Spec] = [tuple(s) for s in m["specs"]]
        v0 = m["synced_version"]
        v1 = self.sink.manifest().version
        if v1 == v0:
            return {"mode": "noop", "synced_version": v0}
        if v1 < v0:
            raise ValueError(f"view synced at v{v0} but sink is at v{v1} (table rolled back?)")
        feed = change_feed(
            self.sink, v0, v1, on_vacuum="allow", delete_image="preimage"
        )
        view = self.spark.read.parquet(os.path.join(self.path, f"data-v{v0}"))
        if all(kind in SELF_MAINTAINABLE for _n, kind, _c in specs):
            mode = "delta"
            new = apply_delta(view, delta_from_feed(feed, group_cols, specs), group_cols, specs)
        else:
            mode = "rescan_groups"
            from jurisprudencia_privada_etl_spark.plans.sink import BUCKET_COLUMN

            state = self.sink.load(version=v1).drop(BUCKET_COLUMN)
            new = refresh_groups(view, feed, state, group_cols, specs)
        self._publish(new, {**m, "synced_version": v1})
        return {"mode": mode, "from_version": v0, "synced_version": v1}
