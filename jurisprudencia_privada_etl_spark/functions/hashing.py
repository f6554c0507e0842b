"""Content-derived identity chain (SURVEY.md §2.7 X9-X12).

The reference derives document identity from content:
  contentHash = sha256(bytes)            (sharepoint.ts:266-268)
  HASH = sha of a canonical field subset (aux.ts:101-111, recomputed on merge
                                          at sharepoint.ts:128-137)
  UUID = deterministic id from HASH      (aux.ts:113, used as the upsert id
                                          at juris.ts:9-13)
plus a cheap source fingerprint (quickXorHash, sharepoint.ts:617).

``sha2(content, 256)`` is also the engine's per-row correctness invariant
(BASELINE.json input_hint: "per-row invariant vs the reference: content
sha256 equality").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def content_sha(col: Column | str = "content") -> Column:
    """The per-row invariant: sha256 hex of the content string (X9)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c.cast("string"), 256)


def canonical_hash(*cols: Column | str) -> Column:
    """Hash of a canonical field subset, nulls canonicalized to '' (X10).

    Field order is fixed by the caller; a NUL separator prevents
    concat-boundary collisions ("ab"+"c" vs "a"+"bc").
    """
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(""))
        for c in cols
    ]
    return F.sha2(F.concat_ws("\x00", *parts), 256)


def deterministic_uuid(hash_col: Column | str) -> Column:
    """Stable UUID-shaped id from a hex hash (X11): first 32 hex chars,
    formatted 8-4-4-4-12.  Same input → same id, the idempotency anchor."""
    h = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def quick_fingerprint(col: Column | str = "content") -> Column:
    """Cheap 64-bit change-detection fingerprint (X12) — the analog of the
    source quickXorHash: compare before running the expensive extraction."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c)
