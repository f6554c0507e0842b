"""Generic MERGE INTO semantics (operators/merge_into.py) pinned against a
hand-computed oracle: three-branch routing, clause conditions, delete-before-
update ordering, insert casting, and the duplicate-source-match guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.operators.merge_into import merge_into


@pytest.fixture()
def tables(spark):
    target = spark.createDataFrame(
        [
            (1, "a", 10),   # matched, update branch
            (2, "b", 20),   # matched, delete branch (s.flag)
            (3, "c", 30),   # target-only, kept
            (9, "z", 90),   # target-only, by-source delete (id % 9 = 0)
            (6, "f", 60),   # target-only, by-source update
        ],
        "id int, name string, val int",
    )
    source = spark.createDataFrame(
        [
            (1, "A", 100, False),
            (2, "B", 200, True),    # delete flag
            (4, "D", 400, False),   # unmatched → insert
            (5, "E", 500, True),    # unmatched, fails insert condition
        ],
        "id int, name string, val int, flag boolean",
    )
    return target, source


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_full_three_branch_merge(spark, tables):
    target, source = tables
    out = merge_into(
        target,
        source,
        on=["id"],
        when_matched_update={"name": "s.name", "val": "t.val + s.val"},
        when_matched_delete="s.flag",
        when_not_matched_insert="all",
        when_not_matched_insert_condition="NOT s.flag",
        when_not_matched_by_source_delete="t.id % 9 = 0",
        when_not_matched_by_source_update={"name": F.lit("stale")},
        when_not_matched_by_source_update_condition="t.val >= 60",
    )
    assert out.columns == ["id", "name", "val"]
    assert _rows(out) == {
        (1, "A", 110),      # updated: name from s, val = t+s
        (3, "c", 30),       # by-source update condition false → kept as-is
        (4, "D", 400),      # inserted (flag false)
        (6, "stale", 60),   # by-source update
        # 2 deleted (matched+flag), 5 not inserted, 9 by-source deleted
    }


def test_update_all_and_insert_all_with_missing_columns(spark, tables):
    target, _ = tables
    # source lacks `val` and carries an extra column: UPDATE*/INSERT* copy
    # same-named columns only; missing target columns null-fill on insert
    # and carry forward on update
    source = spark.createDataFrame(
        [(1, "A", "x"), (7, "G", "y")], "id int, name string, extra string"
    )
    out = merge_into(
        target, source, on=["id"],
        when_matched_update="all", when_not_matched_insert="all",
    )
    rows = _rows(out)
    assert (1, "A", 10) in rows        # name updated, val carried forward
    assert (7, "G", None) in rows      # inserted, val null-filled
    assert (3, "c", 30) in rows        # untouched


def test_no_clauses_given_returns_target_plus_nothing(spark, tables):
    target, source = tables
    # insert clause disabled, no matched clause: MERGE is a no-op
    out = merge_into(target, source, on=["id"], when_not_matched_insert=None)
    assert _rows(out) == _rows(target)


def test_matched_delete_checked_before_update(spark, tables):
    target, source = tables
    out = merge_into(
        target, source, on=["id"],
        when_matched_update="all",           # unconditional update…
        when_matched_delete="s.flag",        # …but delete wins first
        when_not_matched_insert=None,
    )
    ids = {r["id"] for r in out.collect()}
    assert 2 not in ids and 1 in ids


def test_duplicate_source_match_raises_with_validate(spark, tables):
    target, _ = tables
    dup = spark.createDataFrame(
        [(1, "A", 1, False), (1, "A2", 2, False)],
        "id int, name string, val int, flag boolean",
    )
    with pytest.raises(ValueError, match="multiple rows"):
        merge_into(
            target, dup, on=["id"], when_matched_update="all", validate="error"
        )
    # default: trusts the caller (no job, no raise at plan time)
    merge_into(target, dup, on=["id"], when_matched_update="all")


def test_duplicate_unmatched_source_keys_are_legal_with_validate(spark, tables):
    """SQL MERGE's ambiguity error fires only when a TARGET row matches
    multiple source rows; duplicate source keys that match nothing both
    take NOT MATCHED and must pass validate='error' (ADVICE r04)."""
    target, _ = tables
    dup_unmatched = spark.createDataFrame(
        [(40, "X", 1, False), (40, "X2", 2, False)],  # 40 not in target
        "id int, name string, val int, flag boolean",
    )
    out = merge_into(
        target,
        dup_unmatched,
        on=["id"],
        when_matched_update="all",
        validate="error",
    )
    assert out.where(F.col("id") == 40).count() == 2  # both inserted


def test_null_keys_match_null_safely(spark):
    """Pinned divergence from ANSI MERGE (module docstring): NULL merge
    keys on both sides MATCH (engine-wide <=> key semantics)."""
    target = spark.createDataFrame([(None, 1), (2, 2)], "id int, val int")
    source = spark.createDataFrame([(None, 10)], "id int, val int")
    out = merge_into(target, source, on=["id"], when_matched_update="all")
    assert _rows(out) == {(None, 10), (2, 2)}  # updated in place, not re-inserted


def test_insert_casts_to_target_types(spark):
    target = spark.createDataFrame([(1, 10)], "id int, val bigint")
    source = spark.createDataFrame([(2, 20)], "id int, val int")
    out = merge_into(target, source, on=["id"])
    assert dict(out.dtypes)["val"] == "bigint"
    assert _rows(out) == {(1, 10), (2, 20)}


def test_single_shuffle_plan(spark, tables):
    """The whole MERGE is ONE join of the two sides — no re-shuffle of the
    routed output, no Python in the plan."""
    target, source = tables
    out = merge_into(
        target, source, on=["id"],
        when_matched_update="all", when_not_matched_insert="all",
        when_not_matched_by_source_delete="t.id % 9 = 0",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FullOuter") == 1
    assert "BatchEvalPython" not in plan


def test_null_condition_is_not_satisfied(spark):
    """Three-valued logic: a clause condition that evaluates to SQL NULL is
    NOT satisfied — the row must be KEPT (carried forward / not deleted),
    never silently dropped by a NULL leaking into the routing filter."""
    target = spark.createDataFrame(
        [(1, None, 10), (2, "keep", 20), (7, None, 70)],
        "id int, tag string, val int",
    )
    source = spark.createDataFrame(
        [(1, "x", 100), (2, "y", 200)], "id int, tag string, val int"
    )
    out = merge_into(
        target,
        source,
        on=["id"],
        # t.tag is NULL for id=1 → both conditions evaluate NULL there
        when_matched_delete="t.tag = 'drop'",
        when_matched_update={"val": "s.val"},
        when_matched_update_condition="t.tag = 'keep'",
        when_not_matched_insert=None,
        # t.tag NULL for target-only id=7 → by-source delete must not fire
        when_not_matched_by_source_delete="t.tag = 'drop'",
    )
    assert _rows(out) == {
        (1, None, 10),    # NULL delete + NULL update conditions → unchanged
        (2, "keep", 200),  # update condition true → updated
        (7, None, 70),    # NULL by-source delete condition → kept
    }
