"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship CDC replay on sf0.001 through the real sink
              (salt → Arrow extraction → LWW → bucketed MERGE → manifest),
              returning the converged table.
``queries`` — one entry per implemented operator (SURVEY.md §2); see
              jurisprudencia_privada_etl_spark/queries.py.
``oracle_sql`` — DuckDB-equivalent SQL per query; every queries() entry is
              paired (72/72 — hash-dependent operators are restructured to
              engine-independent expected results or replicate the index
              from shared literals; see queries.py section comments).
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from jurisprudencia_privada_etl_spark.plans.replay import ReplayConfig, replay_dataframe
from jurisprudencia_privada_etl_spark.queries import ORACLES, QUERIES, derived_changelog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: replay the changelog derived from sf0.001 events through the
    full pipeline into a fresh lake table; return the converged state."""
    sf_dir = "/root/testdata/sf0.001"
    log = derived_changelog(spark, sf_dir)
    table = tempfile.mkdtemp(prefix="jurisprudencia_etl_entry_")
    shutil.rmtree(table, ignore_errors=True)
    sink = replay_dataframe(spark, log, table, ReplayConfig(n_buckets=16))
    return sink.load().select("repo", "path", "commit", "lang", "content", "ordinal", "content_sha")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
