"""Scalar function library (SURVEY.md §2.7) — JVM expressions first,
vectorized pandas UDFs only where Spark has no builtin (NFD folding)."""

from jurisprudencia_privada_etl_spark.functions.hashing import (  # noqa: F401
    canonical_hash,
    content_sha,
    deterministic_uuid,
    quick_fingerprint,
)
from jurisprudencia_privada_etl_spark.functions.paths import (  # noqa: F401
    basename,
    date_from_path,
    dirname,
    extension,
    first_match_map,
    relativize,
)
from jurisprudencia_privada_etl_spark.functions.text import (  # noqa: F401
    empty_html,
    html_paragraphs,
    nfd_fold_pandas,
    nfd_fold_udf,
    whitespace_canon,
)
