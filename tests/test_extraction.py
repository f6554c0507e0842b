"""Extraction stage: mapInPandas and scalar-pandas-UDF variants agree."""

from __future__ import annotations

from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.extraction import extraction_stage
from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog


def test_extraction_variants_agree(spark):
    log = synthetic_changelog(spark, 400, seed=99, n_epochs=1, n_repos=5, paths_per_repo=30)
    cols = ["repo", "path", "ordinal", "content_sha", "fname", "ext", "path_date",
            "area", "n_tokens", "path_norm", "title_norm", "is_summary"]
    a = extraction_stage(log, columnar=True).select(*cols).orderBy("ordinal").toPandas()
    b = extraction_stage(log, columnar=False).select(*cols).orderBy("ordinal").toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_extraction_fields(spark):
    log = spark.createDataFrame(
        [(0, 1, "I", "r", "Área Cível/2-3-2021/Sumário Ação.pdf", "c", "pdf", "um dois três")],
        ["epoch", "ordinal", "op", "repo", "path", "commit", "lang", "content"],
    )
    row = extraction_stage(log).first()
    assert row["path_norm"] == "area civel/2-3-2021/sumario acao.pdf"
    assert row["title_norm"] == "sumario acao.pdf"
    assert row["is_summary"] is True
    assert row["n_tokens"] == 3
    assert row["ext"] == "pdf"
    assert str(row["path_date"]) == "2021-03-02"
    assert row["area"] == "Área Cível"
    assert row["folder"] == "Área Cível/2-3-2021"
