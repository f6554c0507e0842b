"""Deterministic synthetic CDC changelog generator.

Produces the changelog of SURVEY.md §1.3 / FIXTURES.md §1 — the engine's
analog of the reference's Graph delta-item stream (reference
src/sharepoint/sharepoint.ts:416-461) — entirely with JVM-side expressions
from ``spark.range``: no Python RNG, no wall clock, fully reproducible from
``seed`` (SURVEY.md §7.3 item 3: no nondeterminism leaks).

Shape knobs: number of repos, Zipf-ish hot-repo skew (BASELINE.json north
rule: salted repartitioning must defeat hot-repo skew), update/delete mix
(tombstones — the reference recognizes but skips deletions at
sharepoint.ts:428; here they are first-class), and intra-epoch shuffle so
arrival order never equals ordinal order (out-of-order fixture).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.schemas import OP_DELETE, OP_INSERT, OP_UPDATE

_LANGS = ["py", "ts", "go", "rs", "java", "c", "md", "sql"]
# Accented tokens keep the NFD-normalization path honest (reference
# sharepoint.ts:688-693 accent-folds Portuguese text).
_WORDS = [
    "Sumário", "Secção", "Decisão", "Relator", "Processo", "Acórdão",
    "merge", "commit", "refactor", "fix", "table", "index", "query",
]


def _h(seed: int, tag: int, *cols: Column) -> Column:
    """Deterministic 64-bit hash of (seed, tag, cols...) — the RNG."""
    return F.xxhash64(F.lit(seed), F.lit(tag), *cols)


def _u01(seed: int, tag: int, *cols: Column) -> Column:
    """Deterministic uniform in [0,1) derived from the hash."""
    return F.pmod(_h(seed, tag, *cols), F.lit(1_000_000_000)).cast("double") / 1e9


def synthetic_changelog(
    spark: SparkSession,
    n_events: int,
    *,
    seed: int = 42,
    n_epochs: int = 4,
    n_repos: int = 50,
    paths_per_repo: int = 200,
    skew: float = 3.0,
    pct_update: float = 0.35,
    pct_delete: float = 0.10,
    content_words: int = 40,
    shuffle_within_epoch: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build a changelog DataFrame of ``n_events`` rows.

    ``skew`` > 1 concentrates events on low-numbered repos (u**skew maps the
    uniform toward 0), producing the hot-key distribution the salted
    repartition (operators/salting.py) exists to defeat.

    ``ordinal`` is the global commit ordinal (unique, 0..n-1).  With
    ``shuffle_within_epoch`` the DataFrame's row order within an epoch is a
    hash permutation of ordinal order, so any operator that silently relies
    on arrival order is caught by the fixtures.
    """
    ids = spark.range(0, n_events, 1, num_partitions or spark.sparkContext.defaultParallelism * 2)
    i = F.col("id")
    events_per_epoch = max(1, n_events // n_epochs)

    repo_idx = F.floor(F.pow(_u01(seed, 1, i), F.lit(skew)) * n_repos).cast("long")
    path_idx = F.pmod(_h(seed, 2, i), F.lit(paths_per_repo))
    u_op = _u01(seed, 3, i)

    # Deterministic pseudo-content: seeded word sequence + unique tail so
    # every (key, ordinal) version has distinct content.
    words = F.array(*[F.lit(w) for w in _WORDS])
    content = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(content_words - 1)),
            lambda j: F.element_at(words, (F.pmod(_h(seed, 4, i, j), F.lit(len(_WORDS))) + 1).cast("int")),
        ),
    )

    df = ids.select(
        (i / events_per_epoch).cast("long").alias("epoch"),
        i.alias("ordinal"),
        F.when(u_op < pct_delete, F.lit(OP_DELETE))
        .when(u_op < pct_delete + pct_update, F.lit(OP_UPDATE))
        .otherwise(F.lit(OP_INSERT))
        .alias("op"),
        F.concat(F.lit("repo-"), F.format_string("%04d", repo_idx)).alias("repo"),
        F.concat(
            F.lit("src/dir"),
            (path_idx / 20).cast("long").cast("string"),
            F.lit("/file"),
            path_idx.cast("string"),
            F.lit("."),
            F.element_at(F.array(*[F.lit(x) for x in _LANGS]), (F.pmod(_h(seed, 5, i), F.lit(len(_LANGS))) + 1).cast("int")),
        ).alias("path"),
        F.lower(F.hex(_h(seed, 6, i))).alias("commit"),
        F.element_at(F.array(*[F.lit(x) for x in _LANGS]), (F.pmod(_h(seed, 5, i), F.lit(len(_LANGS))) + 1).cast("int")).alias("lang"),
        F.concat(content, F.lit(" #"), i.cast("string")).alias("content"),
    )

    if shuffle_within_epoch:
        df = (
            df.withColumn("_arrival", _h(seed, 7, F.col("ordinal")))
            .repartition(num_partitions or spark.sparkContext.defaultParallelism * 2, "epoch", "_arrival")
            .sortWithinPartitions("epoch", "_arrival")
            .drop("_arrival")
        )
    return df
