"""PII redaction / pseudonymization — the reference ETL's "anonymize" stage
re-expressed Spark-first.

The reference pipeline is an extract/ANONYMIZE/load of jurisprudence records:
it ships non-anonymized bodies ("Sumário Não Anonimizado" / "Texto Não
Anonimizado", /root/reference/src/sharepoint/sharepoint.ts:55-56,135-136) and
delegates entity removal to an external HTTP anonymizer service
(ANONIMIZADOR_URL, /root/reference/src/sharepoint/index.ts vicinity of
sharepoint.ts:701) — a per-document network call, out of scope for this
engine per SURVEY §2 (network n/a).  What IS in scope is the data-parallel
transform itself, and at 100 TB it must be a JVM-side expression chain, not a
per-row service call:

* ``redact``     — ordered ``regexp_replace`` chain, whole-stage codegen,
                   zero Python.  Category placeholders (``<EMAIL>`` …).
* ``pseudonymize`` — deterministic keyed tokens (``<EMAIL:a1b2c3d4>``):
                   equal entities map to equal tokens (referential
                   integrity across documents survives anonymization, the
                   property entity-linking pipelines need), but the mapping
                   is one-way (BLAKE2b keyed by a salt that stays with the
                   operator).  Arrow-batched pandas UDF — per-match callback
                   replacement has no Column-expression form.
* ``redaction_counts`` — per-category match counts (``regexp_count``), the
                   audit metric an anonymization run reports.

Patterns are RE2-compatible (no lookarounds/backrefs) so the DuckDB oracle
replays the identical chain; rule ORDER matters and is part of the contract
(phones consume their 9-digit runs before the bare-ID rule sees them).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# (category, pattern) in application order — first match wins by consuming
# the span before later rules run.  Conservative, locale-of-the-reference
# (Portuguese jurisprudence) flavored; extend per deployment.
PII_RULES: list[tuple[str, str]] = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IBAN", r"\bPT\d{23}\b"),
    ("PHONE", r"\+\d{9,14}\b"),          # intl form first (+351912345678)
    ("PHONE", r"\b9\d{8}\b"),            # PT mobile
    ("ID", r"\b\d{9}\b"),                # NIF/NISS-shaped 9-digit runs
    ("PROC", r"\b\d{1,6}/\d{2}\.\d[A-Za-z0-9.-]{2,12}\b"),  # case numbers
]


def redact(col: Column | str, rules: list[tuple[str, str]] | None = None) -> Column:
    """Replace every PII match with its category placeholder (``<EMAIL>``).

    Pure JVM ``regexp_replace`` chain — stays inside whole-stage codegen, so
    at 100 TB this is a free rider on whatever scan/projection already runs.
    """
    out = F.col(col) if isinstance(col, str) else col
    for cat, pat in rules or PII_RULES:
        out = F.regexp_replace(out, pat, f"<{cat}>")
    return out


def redaction_counts(col: Column | str, rules: list[tuple[str, str]] | None = None) -> Column:
    """Struct of per-category match counts (the audit metric an anonymize
    run reports).

    Each rule counts against the PROGRESSIVELY redacted text — exactly the
    text its replace sees in the chain — so a span consumed by an earlier
    rule is never double-counted by a later one (a phone's 9-digit run does
    not also count as an ID).  Two rules sharing a category sum.
    """
    rules = rules or PII_RULES
    cur = F.col(col) if isinstance(col, str) else col
    fields = []
    seen: dict[str, Column] = {}
    for cat, pat in rules:
        n = F.regexp_count(cur, F.lit(pat))
        seen[cat] = seen[cat] + n if cat in seen else n
        cur = F.regexp_replace(cur, pat, f"<{cat}>")
    for cat, n in seen.items():
        fields.append(n.alias(f"n_{cat.lower()}"))
    return F.struct(*fields)


def pseudonymize(
    col: Column | str,
    key: str,
    rules: list[tuple[str, str]] | None = None,
    token_hex: int = 8,
) -> Column:
    """Replace each PII match with a keyed deterministic token
    ``<CAT:deadbeef>``: the BLAKE2b-keyed hash of the matched text.

    Equal entities yield equal tokens across all documents and runs (joins
    and co-reference survive anonymization); without ``key`` the mapping is
    not invertible or dictionary-attackable from the output alone.  Arrow
    batches in/out; ONE compiled alternation per batch, per-match callback —
    there is no Column-expression form of keyed per-match replacement.
    """
    import re
    from hashlib import blake2b

    rules = rules or PII_RULES
    compiled = [(cat, re.compile(pat)) for cat, pat in rules]
    key_b = key.encode()

    @pandas_udf("string")
    def _pseudo(s: pd.Series) -> pd.Series:
        def one(text):
            if text is None:
                return None
            for cat, rx in compiled:
                def sub(m, _cat=cat):
                    h = blake2b(m.group(0).encode(), key=key_b,
                                digest_size=max(4, token_hex // 2)).hexdigest()
                    return f"<{_cat}:{h[:token_hex]}>"
                text = rx.sub(sub, text)
            return text

        return s.map(one)

    return _pseudo(F.col(col) if isinstance(col, str) else col)


def redact_columns(
    df: DataFrame,
    cols: list[str],
    rules: list[tuple[str, str]] | None = None,
    mode: str = "placeholder",
    key: str | None = None,
) -> DataFrame:
    """Apply redaction to ``cols`` in place (same names), leaving the rest of
    the schema untouched — the drop-in anonymize stage for a replay pipeline
    (compose with ``ReplayConfig`` extraction or call on any DataFrame).

    ``mode='placeholder'`` → :func:`redact` (JVM chain);
    ``mode='pseudonym'``  → :func:`pseudonymize` (requires ``key``).
    """
    if mode not in ("placeholder", "pseudonym"):
        raise ValueError(f"mode must be 'placeholder' or 'pseudonym', got {mode!r}")
    if mode == "pseudonym" and not key:
        raise ValueError("pseudonym mode requires a key")
    out = df
    for c in cols:
        new = redact(c, rules) if mode == "placeholder" else pseudonymize(c, key, rules)
        out = out.withColumn(c, new)
    return out


def redact_sql(expr: str, rules: list[tuple[str, str]] | None = None) -> str:
    """Render the identical replace chain as ANSI/DuckDB SQL (RE2 'g' flag) —
    the oracle twin of :func:`redact`.  Single quotes in patterns are not
    supported (none of PII_RULES uses them)."""
    out = expr
    for cat, pat in rules or PII_RULES:
        assert "'" not in pat
        out = f"regexp_replace({out}, '{pat}', '<{cat}>', 'g')"
    return out
