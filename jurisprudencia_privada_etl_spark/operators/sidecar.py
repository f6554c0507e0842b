"""Sidecar dimension table: parse, clean, and fuzzy-join (SURVEY.md §2 S4/S5,
J1/J2, A1/A5/A6).

The reference finds a per-folder "tabela" PDF, parses it through a python
child process into rows keyed by process number, and joins each document to
its row by fuzzy containment of the dash→slash-translated filename
(sharepoint.ts:502-593, pdf_parser.py:14-54).  Here:

* the PDF-decode step is out of scope (no network/codecs) — the parse stage
  takes the raw extracted cell grid and reproduces the CLEANING the
  reference's pdf_parser does: whitespace canonicalization of headers and
  cells (pdf_parser.py:44,50-53), duplicate-header disambiguation with _n
  suffixes (dedupe(), pdf_parser.py:23-33), multi-page concat (pd.concat,
  pdf_parser.py:35-49), first-wins keyed reduce dropping null keys
  (sharepoint.ts:526-533);
* the join side is a broadcast hash join on folder (J1) plus a broadcast
  nested-loop containment match filename↔process-key (J2) with the
  reference's fallback defaults when no key matches (sharepoint.ts:588-591).

At scale the dimension stays small (per-folder metadata) — broadcast is the
right physical plan, never a shuffle of the fact side.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jurisprudencia_privada_etl_spark.functions.paths import basename, dash_to_slash, dirname

SIDECAR_SCHEMA = T.StructType(
    [
        T.StructField("folder", T.StringType(), False),
        T.StructField("process_key", T.StringType(), True),
        T.StructField("judge", T.StringType(), True),
        T.StructField("process_mean", T.ArrayType(T.StringType()), True),
        T.StructField("decision", T.StringType(), True),
    ]
)


def dedupe_headers(cols: list[str]) -> list[str]:
    """Duplicate-column-name resolution: suffix _n on repeats (A6,
    pdf_parser.py:23-33)."""
    seen: dict[str, int] = {}
    out = []
    for c in cols:
        if c in seen:
            seen[c] += 1
            out.append(f"{c}_{seen[c]}")
        else:
            seen[c] = 0
            out.append(c)
    return out


def clean_cell(v) -> str | None:
    """Whitespace canonicalization of one cell (X14, pdf_parser.py:50-53)."""
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    s = str(v).replace("\n", " ")
    s = " ".join(s.split())
    return s or None


def parse_sidecar_pages(pages: list[pd.DataFrame], base_ordinal: int = 0) -> pd.DataFrame:
    """Multi-page raw cell grids → one cleaned pandas table (S5/A5/A6).

    Each page's first row is its header (as the reference's table extraction
    yields); headers are cleaned + dedup-suffixed, cells cleaned, pages
    concatenated (pd.concat, pdf_parser.py:49).

    Emits an explicit ``_row`` ordinal — ``base_ordinal`` + (page, row)
    document order — which sidecar_dimension's first-wins reduce keys on.
    The reference's "first" is PDF document order (sharepoint.ts:526-533);
    an explicit ordinal keeps it stable under any Spark partitioning.
    Parsing SEVERAL sidecar files for one folder?  Give each a distinct
    ``base_ordinal`` (e.g. file_index * 1_000_000) before unioning, or the
    per-file ordinals collide and first-wins ties go nondeterministic again.
    """
    frames = []
    for page in pages:
        if len(page) == 0:
            continue
        header = dedupe_headers([clean_cell(h) or "" for h in page.iloc[0]])
        body = page.iloc[1:].reset_index(drop=True)
        body.columns = header
        # element-wise clean; pandas >= 2.1 (pinned transitively by pyspark 4)
        frames.append(body.map(clean_cell))
    if not frames:
        return pd.DataFrame()
    out = pd.concat(frames, ignore_index=True)
    out["_row"] = range(base_ordinal, base_ordinal + len(out))
    return out


# -- byte-level sidecar ingestion (S5's upstream half) ----------------------
#
# The reference feeds raw PDF bytes to a python child process that returns
# the per-page cell grids (sharepoint.ts:537-583 → pdf_parser.py:14-54).
# Two container formats are decoded for real, on the executors:
#   * %PDF payloads — functions/pdftext.py, a from-scratch stdlib text-layer
#     extractor (object scan, FlateDecode, BT/ET span interpretation, grid
#     reconstruction); scanned/encrypted PDFs raise NotImplementedError
#     (OCR is genuinely out of scope, see pdftext docstring);
#   * a simple page container (form-feed-separated pages, ASCII record/
#     unit-separator delimited rows/cells — so cells may carry embedded
#     newlines, which the cleaning then canonicalizes).

PAGE_SEP, ROW_SEP, CELL_SEP = b"\x0c", b"\x1e", b"\x1f"

SIDECAR_CELLS_SCHEMA = T.StructType(
    [
        T.StructField("folder", T.StringType(), False),
        T.StructField("_row", T.LongType(), False),
        T.StructField("cells", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def encode_sidecar_pages(pages: list[list[list[str]]]) -> bytes:
    """Page grids → bytes (test/fixture encoder for the real decoder)."""
    return PAGE_SEP.join(
        ROW_SEP.join(CELL_SEP.join(c.encode() for c in row) for row in page)
        for page in pages
    )


def decode_sidecar_bytes(data: bytes) -> list[pd.DataFrame]:
    """Bytes → raw per-page cell grids (the pdf_parser.py:35-49 shape).

    %PDF payloads decode through the stdlib text-layer extractor
    (functions/pdftext.py) — end-to-end tested against generated grid PDFs;
    scanned/encrypted PDFs raise NotImplementedError there."""
    if data[:5] == b"%PDF-":
        from jurisprudencia_privada_etl_spark.functions.pdftext import pdf_to_grids

        return pdf_to_grids(data)
    pages = []
    for page in data.split(PAGE_SEP):
        rows = [r.split(CELL_SEP) for r in page.split(ROW_SEP) if r != b""]
        if rows:
            pages.append(pd.DataFrame([[c.decode() for c in r] for r in rows]))
    return pages


SIDECAR_QUARANTINE_SCHEMA = T.StructType(
    [
        T.StructField("folder", T.StringType(), False),
        T.StructField("file_index", T.LongType(), False),
        T.StructField("_row", T.LongType(), True),
        T.StructField("cells", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def parse_sidecar_files(files: DataFrame, errors: str = "raise") -> DataFrame:
    """(folder, file_index, data: binary) → cleaned cell rows, Arrow-batched.

    Each file's bytes are decoded to page grids on the EXECUTOR (the child-
    process boundary of the reference becomes a mapInPandas batch), then run
    through parse_sidecar_pages (header dedupe, cell cleaning, multi-page
    concat, deterministic _row ordinals — file_index * 1_000_000 spaces
    files so first-wins order is stable across files, see
    parse_sidecar_pages).  Output is schema-stable (cells as a map) because
    sidecar headers are data, not schema.

    ``errors``: ``"raise"`` (default) fails the task on an undecodable file
    — the strict mode the decode-boundary tests pin.  ``"quarantine"``
    routes the failure into the F10 dead-letter channel instead (the
    reference catches per-item into update.file_errors and carries on,
    sharepoint.ts:595-610): output grows ``file_index`` + ``error``
    columns (SIDECAR_QUARANTINE_SCHEMA), one error row per failed FILE
    (``_row``/``cells`` null, ``error`` = exception text), parse rows
    ``error`` null.  Same single-pass union-schema pattern as
    reconcile.dead_letter_map_in_pandas — decode runs exactly once per
    file; split with ``error IS NULL`` and persist the tagged frame before
    consuming both halves."""
    if errors not in ("raise", "quarantine"):
        raise ValueError(f"errors must be 'raise' or 'quarantine', got {errors!r}")
    quarantine = errors == "quarantine"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for folder, fidx, data in zip(pdf["folder"], pdf["file_index"], pdf["data"]):
                try:
                    grids = decode_sidecar_bytes(bytes(data) if data is not None else b"")
                    cleaned = parse_sidecar_pages(grids, base_ordinal=int(fidx) * 1_000_000)
                except Exception as e:  # noqa: BLE001 — quarantine boundary
                    if not quarantine:
                        raise
                    out.append(
                        (folder, int(fidx), None, None, f"{type(e).__name__}: {e}")
                    )
                    continue
                for rec in cleaned.to_dict("records"):
                    rowid = rec.pop("_row")
                    out.append(
                        (
                            folder,
                            int(fidx),
                            int(rowid),
                            {k: v for k, v in rec.items() if v is not None},
                            None,
                        )
                    )
            cols = ["folder", "file_index", "_row", "cells", "error"]
            frame = pd.DataFrame(out, columns=cols)
            yield frame if quarantine else frame[["folder", "_row", "cells"]]

    schema = SIDECAR_QUARANTINE_SCHEMA if quarantine else SIDECAR_CELLS_SCHEMA
    return files.mapInPandas(run, schema=schema)


def quarantine_sidecar_errors(
    parsed: DataFrame, table_path: str, epoch: int
) -> tuple[DataFrame, int]:
    """Split a quarantine-mode parse and write its error rows to the
    table's SIDECAR dead-letter subchannel
    (``<table>/_dead_letter_sidecar/epoch=N`` — enumerable via
    ``dead_letter_epochs(..., channel=SIDECAR_DEAD_LETTER_DIR)``), so one
    poisoned sidecar quarantines as a row while the epoch commits.

    The subchannel is DISJOINT from the replay's validation channel by
    construction (ADVICE r05): these are ENRICHMENT failures keyed by
    (folder, file_index), not changelog rows, so a routine
    ``requeue_dead_letters(epochs=None)`` can never sweep them into the
    merge loop — re-drive them by re-parsing the repaired file bytes.

    Returns ``(ok_rows, n_dead)``.  The parse is persisted only for the
    dead-letter write and unpersisted before returning (ADVICE r05 — no
    executor-storage leak); consuming ``ok_rows`` re-runs the decode once
    more, the bounded price of not pinning quarantine batches."""
    from jurisprudencia_privada_etl_spark.operators.dead_letter import (
        SIDECAR_DEAD_LETTER_DIR,
    )

    tagged = parsed.persist()
    try:
        dead = tagged.where(F.col("error").isNotNull()).select(
            "folder", "file_index", "error"
        )
        dead_dir = f"{table_path}/{SIDECAR_DEAD_LETTER_DIR}/epoch={epoch}"
        dead.write.mode("overwrite").parquet(dead_dir)
        import pyarrow.parquet as pq  # row count from footers, zero extra jobs
        import os as _os

        n_dead = sum(
            pq.read_metadata(_os.path.join(dead_dir, f)).num_rows
            for f in _os.listdir(dead_dir)
            if f.endswith(".parquet")
        )
    finally:
        tagged.unpersist()
    ok = parsed.where(F.col("error").isNull()).drop("error")
    return ok, n_dead


def sidecar_rows_from_files(files: DataFrame, columns: list[str]) -> DataFrame:
    """Project parsed cell maps onto the expected sidecar columns — the
    bytes-in analog of handing sidecar_dimension a typed raw frame."""
    parsed = parse_sidecar_files(files)
    return parsed.select(
        "folder",
        "_row",
        *[F.col("cells").getItem(c).alias(c) for c in columns],
    )


def sidecar_dimension(
    spark: SparkSession,
    raw: DataFrame,
    key_col: str = "Processo",
    judge_col: str = "Relator",
    mean_col: str = "Meio Processual",
    decision_col: str = "Decisão",
    order_col: str = "_row",
) -> DataFrame:
    """Cleaned raw rows (folder + parsed columns) → keyed dimension:
    first-wins per process key, null keys dropped (A1, sharepoint.ts:526-533).

    "First" is decided by ``order_col`` — the explicit (page, row) ordinal
    parse_sidecar_pages emits — NOT by physical row order, so the dimension
    is identical under any repartitioning (property-tested in
    tests/test_sidecar_complementary.py).
    """
    if order_col not in raw.columns:
        raise ValueError(
            f"sidecar_dimension needs an explicit order column {order_col!r} "
            "(parse_sidecar_pages emits it); physical row order is not "
            "deterministic under Spark partitioning"
        )
    w_first = F.min_by(
        F.struct(F.col(judge_col).alias("judge"),
                 F.transform(
                     # NB: not `F.trim` directly — its optional 2nd arg makes
                     # transform() bind the array index to it (arity trap)
                     F.split(F.coalesce(F.col(mean_col), F.lit("")), ";"),
                     lambda c: F.trim(c),
                 ).alias("process_mean"),
                 F.col(decision_col).alias("decision")),
        F.col(order_col),
    ).alias("_v")
    dim = (
        raw.where(F.col(key_col).isNotNull())
        .groupBy("folder", F.col(key_col).alias("process_key"))
        .agg(w_first)
        .select("folder", "process_key", "_v.judge", "_v.process_mean", "_v.decision")
    )
    return dim


def join_sidecar(
    docs: DataFrame,
    dim: DataFrame,
    path_col: str = "path",
    defaults: dict[str, str] | None = None,
) -> DataFrame:
    """Docs ⋈ sidecar: broadcast equi-join on folder (J1) + containment match
    of dash→slash filename against the process key (J2), with the
    reference's defaults when nothing matches (sharepoint.ts:585-593).
    """
    defaults = defaults or {"judge": "Desconhecido", "decision": "sem decisão"}
    d = docs.withColumn("_folder", dirname(path_col)).withColumn(
        "_fname_key", dash_to_slash(basename(path_col))
    )
    joined = d.join(
        F.broadcast(dim),
        (d["_folder"] == dim["folder"])
        & (F.instr(d["_fname_key"], dim["process_key"]) > 0),
        "left",
    )
    out = joined.select(
        *[d[c] for c in docs.columns],
        F.col("process_key"),
        F.coalesce(F.col("judge"), F.lit(defaults["judge"])).alias("judge"),
        F.coalesce(F.col("process_mean"), F.array()).alias("process_mean"),
        F.coalesce(F.col("decision"), F.lit(defaults["decision"])).alias("decision"),
    )
    return out


def sidecar_fixture_pages() -> list[pd.DataFrame]:
    """The FIXTURES.md `sidecar_dim` messy input: duplicate headers + dirty
    whitespace across two pages."""
    page1 = pd.DataFrame(
        [
            ["Processo", "Relator", "Meio Processual", "Decisão", "Decisão"],
            ["123/45", " Maria\nSilva ", "Recurso;  Apelação", "provido", "dup"],
            ["678/90", "João  Costa", "Revista", " negado ", None],
        ]
    )
    page2 = pd.DataFrame(
        [
            ["Processo", "Relator", "Meio Processual", "Decisão", "Decisão"],
            [None, "Sem Chave", "X", "ignorar", None],  # null key dropped
            ["123/45", "Outra Pessoa", "Outro", "outro", None],  # first-wins loser
        ]
    )
    return [page1, page2]
