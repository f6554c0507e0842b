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


# -- driver-side twin of Spark's xxhash64 ------------------------------------
#
# Spark's ``F.xxhash64(c1, c2, ...)`` is XXH64 chained column-by-column:
# ``h = XXH64(bytes(c1), seed=42); h = XXH64(bytes(c2), seed=h); ...`` with
# strings contributing their UTF-8 bytes.  The sink's bucket id is
# ``pmod(xxhash64(repo, path), n_buckets)`` (plans/sink.py bucket_of) — a
# pure-Python twin lets the DRIVER compute a key's bucket with no Spark job
# at all, which is what makes point lookups on a 100 TB table metadata-cheap:
# prune to 1 of n_buckets before any scan is planned.  Parity with the JVM
# implementation is pinned by tests/test_functions.py (ASCII, multi-byte
# UTF-8, empty, every tail-length class, and the two-column chain).

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M64


def xxhash64_py(data: bytes, seed: int = 42) -> int:
    """XXH64 over ``data`` as a SIGNED 64-bit int, matching Spark's
    ``xxhash64`` output domain (Spark hashes return long)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_strings_py(*values: str, seed: int = 42) -> int:
    """Driver-side twin of ``F.xxhash64(c1, c2, ...)`` for string columns:
    chain XXH64 across the values, each one's hash seeding the next."""
    h = seed
    for v in values:
        h = xxhash64_py(v.encode("utf-8"), seed=h & _M64)
    return h
