"""Text expressions + the one genuine pandas UDF: NFD accent folding.

Everything except NFD folding is a JVM Column expression (stays inside
whole-stage codegen).  Spark has no Unicode-NFD builtin, so folding is a
vectorized Arrow-batched pandas UDF (SURVEY.md §2.7 X1) — the engine's only
Python scalar function, and it is Series-at-a-time, never row-at-a-time.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# NFD accent fold (reference sharepoint.ts:688-693:
#   s.normalize("NFD").replace(/[̀-ͯ]/g, "").toLowerCase())
# ---------------------------------------------------------------------------

_MARKS_RE = re.compile(r"[̀-ͯ]")
_SEP = "\x00"


def nfd_fold_pandas(s: pd.Series) -> pd.Series:
    """Shared implementation used by BOTH the Spark UDF and the test oracle,
    so normalization parity is by construction (SURVEY.md §7.3 item 2).

    Vectorization: pandas ``.str`` ops loop per row in Python, which made the
    Arrow stage the pipeline bottleneck.  Instead the whole batch is joined
    with a NUL separator and normalized/stripped/lowered in three C-level
    passes over one big string, then split back.  Safe because NUL is a
    Unicode starter (NFD never reorders across it, and Python's only
    context-sensitive lowercase rule — final sigma — still sees a word
    boundary at NUL).  Rows that themselves contain NUL take the per-row
    fallback path.
    """
    na = s.isna()
    vals = s.fillna("").astype(str).tolist()
    if any(_SEP in v for v in vals):
        folded = [_MARKS_RE.sub("", unicodedata.normalize("NFD", v)).lower() for v in vals]
    else:
        joined = _SEP.join(vals)
        if joined.isascii():
            # ASCII fast path: NFD is the identity on ASCII, the combining-
            # mark strip removes nothing, and str.lower() is the whole fold —
            # ONE C pass instead of three.  Most code/text corpora are
            # majority-ASCII, so whole batches take this branch.
            folded = joined.lower().split(_SEP)
        else:
            folded = _MARKS_RE.sub("", unicodedata.normalize("NFD", joined)).lower().split(_SEP)
    out = pd.Series(folded, index=s.index, dtype="object")
    out[na] = None
    return out


@pandas_udf(T.StringType())
def nfd_fold_udf(s: pd.Series) -> pd.Series:
    return nfd_fold_pandas(s)


def nfd_fold_py(text: str) -> str:
    """Plain-Python oracle for single strings (property tests)."""
    decomposed = unicodedata.normalize("NFD", text)
    stripped = "".join(ch for ch in decomposed if not ("̀" <= ch <= "ͯ"))
    return stripped.lower()


# ---------------------------------------------------------------------------
# JVM expressions
# ---------------------------------------------------------------------------

def whitespace_canon(col: Column | str) -> Column:
    """Newlines → space, collapse runs, trim (reference pdf_parser.py:44,50-53)."""
    c = _c(col)
    return F.trim(F.regexp_replace(F.regexp_replace(c, r"\n", " "), r"\s+", " "))


def html_paragraphs(lines: Column | str) -> Column:
    """Array of lines → '<p><font>line</font><br>' joined (aux.ts:56, 74-77)."""
    arr = _c(lines)
    return F.array_join(
        F.transform(arr, lambda x: F.concat(F.lit("<p><font>"), x, F.lit("</font><br>"))),
        "",
    )


def empty_html(col: Column | str) -> Column:
    """True when HTML is effectively empty after stripping tags
    (testEmptyHTML, juris.ts:16-23)."""
    c = _c(col)
    return F.trim(F.regexp_replace(c, r"<[^>]*>", "")) == F.lit("")


def strip_html(col: Column | str) -> Column:
    c = _c(col)
    return F.trim(F.regexp_replace(c, r"<[^>]*>", ""))


def faceted_triple(*values: Column | str) -> Column:
    """Faceted field triple {Index, Original, Show} — the reference's indexed
    facet shape (X18, aux.ts:70, 86-99; sharepoint.ts:125): each facet keeps
    three parallel string arrays."""
    vals = F.array(*[(F.col(v) if isinstance(v, str) else v).cast("string") for v in values])
    return F.struct(
        vals.alias("Index"), vals.alias("Original"), vals.alias("Show")
    )
