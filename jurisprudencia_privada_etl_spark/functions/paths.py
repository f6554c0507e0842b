"""Path-derived expressions (SURVEY.md §2.7 X2, X4-X7, X16).

All JVM-side Column expressions — these run inside whole-stage codegen, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def basename(col: Column | str) -> Column:
    """Final path segment (reference uses node path.basename, e.g.
    sharepoint.ts:256, 383)."""
    return F.substring_index(_c(col), "/", -1)


def dirname(col: Column | str) -> Column:
    """Parent directory: everything before the last '/'; '' when no '/'."""
    c = _c(col).cast("string")
    keep = F.length(c) - F.length(basename(c)) - F.lit(1)
    return F.when(c.contains("/"), F.substring(c, F.lit(1), keep)).otherwise(F.lit(""))


def extension(col: Column | str) -> Column:
    """Lower-cased extension without dot; '' when none (sharepoint.ts:633-641)."""
    base = basename(col)
    ext = F.when(base.contains("."), F.lower(F.substring_index(base, ".", -1))).otherwise(F.lit(""))
    return ext


def relativize(col: Column | str, prefix_patterns: list[str] | None = None, root: str | None = None) -> Column:
    """Strip store prefixes and ensure a leading '/', optionally prepending a
    root name — the analog of generateRelPath (sharepoint.ts:643-656)."""
    c = _c(col).cast("string")
    for pat in prefix_patterns or [r"^/drives/[^/]+", r"^/drive/root:"]:
        c = F.regexp_replace(c, pat, "")
    c = F.when(c.startswith("/"), c).otherwise(F.concat(F.lit("/"), c))
    if root is not None:
        c = F.concat(F.lit("/" + root), c)
    return c


def date_from_path(col: Column | str, default_year: int) -> Column:
    """Extract the LAST d-m[-y] group from the directory part of a path and
    build a date; a missing year falls back to ``default_year``.

    Reference: getDateAreaSection takes the last regex match in dirname and
    defaults the year to the CURRENT year (sharepoint.ts:476-483) — a
    wall-clock determinism leak the engine fixes by requiring the epoch
    config to supply ``default_year`` (SURVEY.md §7.3 item 3).
    """
    d = dirname(col)
    # try_* variants keep the expression null-safe under ANSI mode (Spark 4
    # default): no date in the path → null, not an exception.
    last = F.try_element_at(F.regexp_extract_all(d, F.lit(r"(\d{1,2}-\d{1,2}(-\d{2,4})?)"), 1), F.lit(-1))
    parts = F.split(last, "-")
    day = F.try_element_at(parts, F.lit(1)).cast("int")
    month = F.try_element_at(parts, F.lit(2)).cast("int")
    year_raw = F.try_element_at(parts, F.lit(3)).cast("int")
    year = F.when(year_raw.isNull(), F.lit(default_year)).when(
        year_raw < 100, year_raw + 2000
    ).otherwise(year_raw)
    return F.when(
        day.isNotNull() & month.isNotNull(),
        F.try_to_date(F.format_string("%04d-%02d-%02d", year, month, day)),
    ).otherwise(F.lit(None).cast("date"))


def first_match_map(col: Column | str, mapping: list[tuple[str, str]], default: str | None = None) -> Column:
    """Ordered first-contains-match dictionary lookup (sharepoint.ts:485-497):
    the first mapping key contained in lower(col) wins.  Generated as a CASE
    chain — pure codegen, no UDF."""
    low = F.lower(_c(col))
    expr: Column | None = None
    for k, v in mapping:
        cond = low.contains(k.lower())
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    if expr is None:
        return F.lit(default)
    return expr.otherwise(F.lit(default))


def dash_to_slash(col: Column | str) -> Column:
    """Filename '-' → '/' so it can match process keys (sharepoint.ts:586-587)."""
    return F.translate(_c(col), "-", "/")
