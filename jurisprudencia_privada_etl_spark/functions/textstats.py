"""Text-analysis expressions for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure JVM Column expressions (whole-stage codegen); the stopword tables
are tiny literals baked into the plan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.operators.dedup import tokens

# Minimal high-frequency stopword sets per language (public common words).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "in", "a", "is", "that", "for", "it"],
    "pt": ["de", "a", "o", "que", "e", "do", "da", "em", "um", "para"],
    "es": ["de", "la", "que", "el", "en", "y", "a", "los", "se", "del"],
    "fr": ["de", "la", "le", "et", "les", "des", "en", "un", "du", "une"],
    "de": ["der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich"],
}


def stopword_ratio(col: Column | str, lang: str) -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    t = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(t) > 0, hits.cast("double") / F.size(t)).otherwise(F.lit(0.0))


def lang_id(col: Column | str, langs: list[str] | None = None) -> Column:
    """Heuristic language ID: the language whose stopword-hit ratio is
    highest wins ('und' when nothing matches).  One pass per language over
    the token array, all codegen."""
    langs = langs or list(STOPWORDS)
    scores = F.array(
        *[
            F.struct(stopword_ratio(col, lg).alias("score"), F.lit(lg).alias("lang"))
            for lg in langs
        ]
    )
    best = F.array_max(scores)  # struct ordering: score first, then lang
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def lang_id_pandas(col: Column | str, langs: list[str] | None = None) -> Column:
    """Arrow-vectorized language ID — same decision rule as ``lang_id``
    (argmax of stopword-hit ratio, ties broken by language code, 'und' when
    nothing matches), one tokenize + set-membership pass per row instead of
    one interpreted higher-order filter per language.  Semantics are
    identical by construction (same stopword tables, same tie-break) and
    asserted equal in tests."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    langs = langs or list(STOPWORDS)
    tables = [(lg, frozenset(STOPWORDS[lg])) for lg in langs]

    @pandas_udf(T.StringType())
    def lid(texts: pd.Series) -> pd.Series:
        import re

        # Java \s (the expr form's split) is ASCII-only; Python str.split()
        # breaks on ALL Unicode whitespace (e.g. U+00A0) — parity requires
        # the exact same class
        java_ws = re.compile("[ \\t\\n\\x0b\\f\\r]+")
        out = []
        for t in texts:
            toks = [w for w in java_ws.split((t or "").lower()) if w]
            if not toks:
                out.append("und")
                continue
            best_score, best_lang = 0.0, None
            for lg, sw in tables:
                score = sum(1 for w in toks if w in sw) / len(toks)
                # max on (score, lang) — the struct ordering of the expr form
                if score > best_score or (score == best_score and best_lang is not None and lg > best_lang):
                    best_score, best_lang = score, lg
            out.append(best_lang if best_score > 0 else "und")
        return pd.Series(out)

    return lid(F.col(col) if isinstance(col, str) else col)


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.filter(F.split(c, r"\s+"), lambda t: t != ""))


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def subword_count(col: Column | str) -> Column:
    """BPE-ish unit count: runs of letters, runs of digits, single symbols —
    a cheap proxy for tokenizer token counts."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def punct_ratio(col: Column | str) -> Column:
    c = (F.col(col) if isinstance(col, str) else col).cast("string")
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(F.length(c) > 0, punct.cast("double") / F.length(c)).otherwise(F.lit(0.0))


def mean_token_len(col: Column | str) -> Column:
    t = tokens(col, lowercase=False)
    total = F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    return F.when(F.size(t) > 0, total.cast("double") / F.size(t)).otherwise(F.lit(0.0))


def quality_score(col: Column | str, lang: str = "en") -> Column:
    """Composite [0,1] quality heuristic: length band + sane punctuation +
    stopword presence + sane mean token length.  Each component is a simple
    bounded expression; weights sum to 1."""
    n = token_count(col).cast("double")
    length_ok = F.least(n / F.lit(20.0), F.lit(1.0))  # saturates at 20 tokens
    punct_ok = F.lit(1.0) - F.least(punct_ratio(col) * 4, F.lit(1.0))
    sw_ok = F.least(stopword_ratio(col, lang) * 4, F.lit(1.0))
    mtl = mean_token_len(col)
    mtl_ok = F.when((mtl >= 2.0) & (mtl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return length_ok * 0.3 + punct_ok * 0.2 + sw_ok * 0.3 + mtl_ok * 0.2


def doc_fingerprint(col: Column | str, modulus: int = 1 << 55) -> Column:
    """Order-sensitive polynomial rolling hash over tokens (content
    fingerprint).  pmod keeps the fold inside bigint range — ANSI-safe.
    The token hash is Spark's xxhash64 (fast, JVM-internal) — use
    ``doc_fingerprint_md5`` when the result must be reproducible outside
    Spark (the DuckDB-oracle-paired driver query)."""
    t = tokens(col, lowercase=False)
    return F.aggregate(
        t,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * 31 + F.pmod(F.xxhash64(x), F.lit(1 << 31)), F.lit(modulus)),
    )


def doc_fingerprint_md5(col: Column | str) -> Column:
    """Engine-independent order-sensitive fingerprint: a chained md5 over
    whitespace tokens — fp = md5(md5(...md5('' || t1)... || tn)), '' for an
    empty document.  Both md5 and the sequential fold exist verbatim in
    DuckDB (list_reduce over a ''-prepended token list), so the same
    document yields the same hex string in either engine."""
    t = tokens(col, lowercase=False)
    return F.aggregate(t, F.lit(""), lambda acc, x: F.md5(F.concat(acc, x)))
