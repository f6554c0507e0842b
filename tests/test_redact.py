"""PII redaction / pseudonymization (operators/redact.py) — the reference
ETL's anonymize stage (external ANONIMIZADOR service in the reference,
sharepoint.ts:701 vicinity) as a data-parallel transform."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.operators.redact import (
    PII_RULES,
    pseudonymize,
    redact,
    redact_columns,
    redact_sql,
    redaction_counts,
)

SAMPLE = (
    "Contacte joao.silva+x@tribunal.example.pt ou tel +351912345678 / 912345678. "
    "NIF 123456789, IBAN PT50000201231234567890154, Proc 1234/20.7T8LSB-A.S1 fim. "
    "ano 2026 pequeno 12345678"
)
EXPECTED = (
    "Contacte <EMAIL> ou tel <PHONE> / <PHONE>. "
    "NIF <ID>, IBAN <IBAN>, Proc <PROC> fim. "
    "ano 2026 pequeno 12345678"
)


def test_redact_placeholder_chain(spark):
    row = (
        spark.createDataFrame([(SAMPLE,)], "s string")
        .select(redact("s").alias("r"))
        .first()
    )
    assert row.r == EXPECTED


def test_redact_is_jvm_side(spark):
    df = spark.createDataFrame([(SAMPLE,)], "s string").select(redact("s").alias("r"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_redaction_counts_rule_order(spark):
    # 912345678 starts with 9 → PHONE claims it; 123456789 → ID; the phone
    # rule must consume its digit run BEFORE the bare-ID rule sees it.
    row = (
        spark.createDataFrame([(SAMPLE,)], "s string")
        .select(redaction_counts("s").alias("c"))
        .select("c.*")
        .first()
    )
    assert (row.n_email, row.n_iban, row.n_phone, row.n_id, row.n_proc) == (1, 1, 2, 1, 1)


def test_pseudonymize_referential_integrity(spark):
    df = spark.createDataFrame(
        [("mail a@b.pt x",), ("mail a@b.pt y",), ("mail c@d.pt x",)], "s string"
    ).select(pseudonymize("s", key="k1").alias("p"))
    a, b, c = [r.p for r in df.collect()]
    tok = a.split()[1]
    assert tok.startswith("<EMAIL:") and tok.endswith(">")
    assert b.split()[1] == tok          # same entity → same token
    assert c.split()[1] != tok          # different entity → different token
    # a different key re-maps every token
    a2 = (
        spark.createDataFrame([("mail a@b.pt x",)], "s string")
        .select(pseudonymize("s", key="k2").alias("p"))
        .first()
        .p
    )
    assert a2.split()[1] != tok
    # nulls and PII-free text pass through
    free = spark.createDataFrame([(None,), ("sem dados",)], "s string").select(
        pseudonymize("s", key="k1").alias("p")
    )
    assert [r.p for r in free.collect()] == [None, "sem dados"]


def test_redact_columns_modes(spark):
    df = spark.createDataFrame([(1, SAMPLE, SAMPLE)], "id int, a string, b string")
    out = redact_columns(df, ["a", "b"]).first()
    assert out.a == EXPECTED and out.b == EXPECTED and out.id == 1
    pseudo = redact_columns(df, ["a"], mode="pseudonym", key="k").first()
    assert "<EMAIL:" in pseudo.a and pseudo.b == SAMPLE
    with pytest.raises(ValueError, match="mode"):
        redact_columns(df, ["a"], mode="nope")
    with pytest.raises(ValueError, match="key"):
        redact_columns(df, ["a"], mode="pseudonym")


def test_redact_sql_twin_matches_spark(spark):
    """The rendered DuckDB chain replays the Spark chain verbatim (the
    queries.py oracle relies on this; RE2 vs java.util.regex parity for the
    constructs PII_RULES uses)."""
    duckdb = pytest.importorskip("duckdb")
    sql = redact_sql("s")
    got = duckdb.execute(f"SELECT {sql} AS r FROM (SELECT ? AS s)", [SAMPLE]).fetchone()[0]
    assert got == EXPECTED
    assert len({cat for cat, _ in PII_RULES}) == 5
