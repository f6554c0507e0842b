from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from jurisprudencia_privada_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def oracle_reduce(changelog: pd.DataFrame) -> pd.DataFrame:
    """Independent LWW reducer (FIXTURES.md §2): per (repo, path) keep the
    max-ordinal row; drop the key when that row is a tombstone."""
    df = changelog.sort_values("ordinal")
    last = df.groupby(["repo", "path"], as_index=False).last()
    live = last[last["op"] != "D"].copy()
    live["content_sha"] = live["content"].map(sha256_hex)
    return (
        live[["repo", "path", "commit", "lang", "content", "ordinal", "content_sha"]]
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


def assert_state_equal(actual: pd.DataFrame, expected: pd.DataFrame) -> None:
    """Row-for-row equality on (key, content_sha) — BASELINE.json invariant —
    plus the full payload."""
    a = actual.sort_values(["repo", "path"]).reset_index(drop=True)
    e = expected.sort_values(["repo", "path"]).reset_index(drop=True)
    assert len(a) == len(e), f"row count {len(a)} != {len(e)}"
    for col in ["repo", "path", "content_sha", "ordinal", "commit", "lang", "content"]:
        if col in a.columns and col in e.columns:
            pd.testing.assert_series_equal(
                a[col], e[col], check_names=False, check_dtype=False, obj=col
            )
