"""Unit tests for the scalar-function library (SURVEY.md §5 item 1)."""

from __future__ import annotations

import datetime
import hashlib

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.functions.hashing import (
    canonical_hash,
    content_sha,
    deterministic_uuid,
    quick_fingerprint,
)
from jurisprudencia_privada_etl_spark.functions.paths import (
    basename,
    dash_to_slash,
    date_from_path,
    dirname,
    extension,
    first_match_map,
    relativize,
)
from jurisprudencia_privada_etl_spark.functions.text import (
    empty_html,
    html_paragraphs,
    nfd_fold_pandas,
    nfd_fold_py,
    nfd_fold_udf,
    whitespace_canon,
)


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


# -- NFD folding parity (SURVEY.md §7.3 item 2) -------------------------------

PT_SAMPLES = ["Sumário", "Secção", "Decisão", "Acórdão", "JURISPRUDÊNCIA", "ação à é ï"]


def test_nfd_fold_pandas_matches_python_oracle():
    s = pd.Series(PT_SAMPLES)
    assert list(nfd_fold_pandas(s)) == [nfd_fold_py(x) for x in PT_SAMPLES]


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_nfd_fold_property(txt):
    got = nfd_fold_pandas(pd.Series([txt], dtype="object"))[0]
    assert got == nfd_fold_py(txt)


def test_nfd_fold_udf_on_spark(spark):
    df = spark.createDataFrame([(x,) for x in PT_SAMPLES], ["t"])
    got = [r["n"] for r in df.select(nfd_fold_udf("t").alias("n")).collect()]
    assert got == [nfd_fold_py(x) for x in PT_SAMPLES]


# -- hash chain (X9/X10/X11/X12) ----------------------------------------------

def test_content_sha_matches_hashlib(spark):
    text = "Sumário do acórdão nº 42\nlinha 2"
    assert one(spark, content_sha(F.lit(text))) == hashlib.sha256(text.encode()).hexdigest()


def test_canonical_hash_null_canonicalization(spark):
    # null and '' canonicalize identically, field boundaries preserved
    h1 = one(spark, canonical_hash(F.lit("ab"), F.lit(None), F.lit("c")))
    h2 = one(spark, canonical_hash(F.lit("ab"), F.lit(""), F.lit("c")))
    h3 = one(spark, canonical_hash(F.lit("a"), F.lit("b"), F.lit("c")))
    assert h1 == h2
    assert h1 != h3  # "ab","","c" differs from "a","b","c"


def test_deterministic_uuid_shape_and_stability(spark):
    u1 = one(spark, deterministic_uuid(content_sha(F.lit("x"))))
    u2 = one(spark, deterministic_uuid(content_sha(F.lit("x"))))
    assert u1 == u2
    parts = u1.split("-")
    assert [len(p) for p in parts] == [8, 4, 4, 4, 12]


def test_quick_fingerprint_changes_with_content(spark):
    assert one(spark, quick_fingerprint(F.lit("a"))) != one(spark, quick_fingerprint(F.lit("b")))


# -- path functions (X2, X5-X7) ------------------------------------------------

def test_basename_dirname_extension(spark):
    df = spark.createDataFrame([("a/b/c.PDF",), ("nofolder.txt",), ("plain",)], ["p"])
    rows = df.select(
        basename("p").alias("b"), dirname("p").alias("d"), extension("p").alias("e")
    ).collect()
    assert [(r["b"], r["d"], r["e"]) for r in rows] == [
        ("c.PDF", "a/b", "pdf"),
        ("nofolder.txt", "", "txt"),
        ("plain", "", ""),
    ]


def test_date_from_path_variants(spark):
    df = spark.createDataFrame(
        [
            ("civel/2-3-2021/doc.pdf",),       # full d-m-y
            ("civel/5-6/doc.pdf",),            # missing year → default
            ("x/1-1-99/d.pdf",),               # 2-digit year → 2099
            ("no/date/here.pdf",),             # no match → null
            ("a/9-9-2020/b/10-11-2022/c.pdf",),  # LAST match wins (sharepoint.ts:476-478)
        ],
        ["p"],
    )
    got = [r["d"] for r in df.select(date_from_path("p", 2026).alias("d")).collect()]
    assert got == [
        datetime.date(2021, 3, 2),
        datetime.date(2026, 6, 5),
        datetime.date(2099, 1, 1),
        None,
        datetime.date(2022, 11, 10),
    ]


def test_first_match_map_order_matters(spark):
    m = [("contencioso", "first"), ("conten", "second")]
    assert one(spark, first_match_map(F.lit("x/CONTENCIOSO/y"), m, "none")) == "first"
    assert one(spark, first_match_map(F.lit("x/contenda/y"), m, "none")) == "second"
    assert one(spark, first_match_map(F.lit("zzz"), m, "none")) == "none"


def test_relativize_and_dash_to_slash(spark):
    assert one(spark, relativize(F.lit("/drives/abc123/docs/f.pdf"), root="drv")) == "/drv/docs/f.pdf"
    assert one(spark, dash_to_slash(F.lit("123-45-2020"))) == "123/45/2020"


# -- text expressions (X8, X14, X19) -------------------------------------------

def test_whitespace_canon(spark):
    assert one(spark, whitespace_canon(F.lit("  a\nb   c\t d  "))) == "a b c d"


def test_html_paragraphs_and_empty_html(spark):
    wrapped = one(spark, html_paragraphs(F.array(F.lit("l1"), F.lit("l2"))))
    assert wrapped == "<p><font>l1</font><br><p><font>l2</font><br>"
    assert one(spark, empty_html(F.lit("<p> <br/> </p>"))) is True
    assert one(spark, empty_html(F.lit("<p>texto</p>"))) is False


def test_faceted_triple(spark):
    from jurisprudencia_privada_etl_spark.functions.text import faceted_triple

    row = spark.range(1).select(faceted_triple(F.lit("Cível")).alias("f")).first()["f"]
    assert row["Index"] == ["Cível"] and row["Original"] == ["Cível"] and row["Show"] == ["Cível"]
