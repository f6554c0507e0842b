"""Checkpoint / lineage manifest with atomic publish (SURVEY.md §2.8 T1-T3).

The reference checkpoints a FilesystemUpdate record carrying the resume
tokens ``delta_link``/``next_link`` plus created/updated/deleted counters
(reference src/aux.ts:23-41, sharepoint.ts:181, 402, 424-425).  The engine's
analog is a versioned JSON manifest per table snapshot:

  * ``last_committed_epoch`` — the resume offset (T1): restart reads the
    current manifest and continues at epoch+1.
  * ``schema`` — the table schema with stable column ids (T6).
  * ``buckets`` — which data directory holds each hash bucket, and which
    schema version wrote it (the copy-on-write file inventory).
  * ``metrics`` — per-epoch lineage: created/updated/deleted counts and
    per-partition applied-event/byte metrics (A2; BASELINE.json north star).

Atomicity (T3, SURVEY.md §7.3 item 1): a manifest is written to a temp name
and ``os.rename``d into place — atomic on POSIX — and only AFTER the
snapshot's data files are fully written.  The current snapshot is simply the
highest ``v{N}.json``; a crash between data write and manifest publish leaves
orphan data files and an unchanged table, and the epoch re-runs idempotently.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

from jurisprudencia_privada_etl_spark.schemas import TableSchema

MANIFEST_DIR = "_manifest"


@dataclass
class Manifest:
    version: int
    last_committed_epoch: int  # -1 = nothing committed yet
    schema: TableSchema
    # bucket id (str for JSON) -> {"path": relative data dir, "schema_version": int}
    buckets: dict[str, dict[str, Any]] = field(default_factory=dict)
    n_buckets: int = 64
    metrics: dict[str, Any] = field(default_factory=dict)
    parent_version: int | None = None

    def to_json(self) -> dict:
        return {
            "version": self.version,
            "last_committed_epoch": self.last_committed_epoch,
            "schema": self.schema.to_json(),
            "buckets": self.buckets,
            "n_buckets": self.n_buckets,
            "metrics": self.metrics,
            "parent_version": self.parent_version,
        }

    @staticmethod
    def from_json(d: dict) -> "Manifest":
        return Manifest(
            version=d["version"],
            last_committed_epoch=d["last_committed_epoch"],
            schema=TableSchema.from_json(d["schema"]),
            buckets=d.get("buckets", {}),
            n_buckets=d.get("n_buckets", 64),
            metrics=d.get("metrics", {}),
            parent_version=d.get("parent_version"),
        )


EPOCH_PROPERTY = "etl.last-committed-epoch"


def epoch_already_applied(last_committed: int | str | None, epoch: int) -> bool:
    """Exactly-once gate shared by every sink (T3).

    ``last_committed`` is whatever the sink's commit metadata stores — the
    manifest's ``last_committed_epoch`` int for HadoopParquetSink, the
    ``etl.last-committed-epoch`` table/snapshot property string for
    IcebergSink (absent/None = nothing committed).  Returns True when
    ``epoch`` was already applied and the merge must be skipped.
    """
    if last_committed is None:
        return False
    return int(last_committed) >= epoch


def _mdir(table_path: str) -> str:
    return os.path.join(table_path, MANIFEST_DIR)


def _vname(version: int) -> str:
    return f"v{version:08d}.json"


class CommitConflictError(RuntimeError):
    """Another writer published this manifest version first.  The losing
    commit must NOT be retried blindly: reload the table state and decide —
    a racing twin of the same epoch means the work is already committed
    (skip); a divergent concurrent write means the caller's snapshot is
    stale and the operation must be re-planned on the new current version.
    This is the filesystem analog of Iceberg's metadata-pointer CAS."""


def publish(table_path: str, manifest: Manifest, overwrite: bool = False) -> None:
    """Atomic compare-and-swap publish of a manifest version.

    The manifest is fully written + fsynced to a temp name, then
    ``os.link``ed to its final ``v{N}.json`` — an atomic
    create-if-not-exists on POSIX, so of two writers racing to commit the
    same version exactly one wins and the other raises
    ``CommitConflictError`` (a plain rename would let the last writer
    silently clobber the first commit's bucket pointers).

    ``overwrite=True`` is reserved for same-version METADATA rewrites that
    do not move the table state (e.g. expire_snapshots tagging a retained
    manifest schema-only); table-state commits must never pass it.
    """
    d = _mdir(table_path)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, _vname(manifest.version))
    pid = os.getpid()
    tmp = f"{final}.{pid}.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest.to_json(), f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    if overwrite:
        os.rename(tmp, final)  # atomic on POSIX
        return
    try:
        os.link(tmp, final)  # atomic create-if-not-exists
    except FileExistsError:
        raise CommitConflictError(
            f"manifest v{manifest.version} already published at {table_path}"
        ) from None
    finally:
        os.unlink(tmp)


def current_version(table_path: str) -> int | None:
    d = _mdir(table_path)
    if not os.path.isdir(d):
        return None
    versions = [
        int(name[1:9])
        for name in os.listdir(d)
        if name.startswith("v") and name.endswith(".json")
    ]
    return max(versions) if versions else None


def load(table_path: str, version: int | None = None) -> Manifest | None:
    if version is None:
        version = current_version(table_path)
        if version is None:
            return None
    with open(os.path.join(_mdir(table_path), _vname(version))) as f:
        return Manifest.from_json(json.load(f))


# -- write-audit-publish staging (Iceberg's WAP pattern on this manifest) -----

STAGED_NAME = "staged.json"


def publish_staged(table_path: str, manifest: Manifest) -> None:
    """Stage a snapshot WITHOUT exposing it: same atomic write-then-rename,
    but to ``staged.json``, which ``current_version`` never reads.  Readers
    keep seeing the parent snapshot; ``promote_staged`` flips the staged
    manifest into the committed ``v{N}.json`` line after audits pass."""
    d = _mdir(table_path)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, STAGED_NAME)
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest.to_json(), f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, final)


def load_staged(table_path: str) -> Manifest | None:
    p = os.path.join(_mdir(table_path), STAGED_NAME)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return Manifest.from_json(json.load(f))


def discard_staged(table_path: str) -> bool:
    p = os.path.join(_mdir(table_path), STAGED_NAME)
    if not os.path.exists(p):
        return False
    os.remove(p)
    return True


class StaleStagedError(RuntimeError):
    """The table advanced past the staged snapshot's parent — the staged
    merge was computed against a state that no longer exists and must be
    aborted and re-run, never promoted."""


def promote_staged(table_path: str) -> Manifest:
    """Commit the staged snapshot: verify its parent is still the current
    version (optimistic-concurrency check), publish it as ``v{N}.json``,
    then drop the stage marker.  A crash between publish and drop leaves a
    stale ``staged.json`` whose parent check fails — the next
    ``promote_staged`` raises and ``discard_staged`` cleans it up; the
    COMMITTED line is already correct either way."""
    staged = load_staged(table_path)
    if staged is None:
        raise FileNotFoundError(f"no staged snapshot at {table_path}")
    cur = current_version(table_path)
    if cur != staged.parent_version:
        raise StaleStagedError(
            f"staged snapshot v{staged.version} was built on v{staged.parent_version} "
            f"but the table is now at v{cur}; abort and re-merge"
        )
    publish(table_path, staged)
    discard_staged(table_path)
    return staged


# -- named refs (Iceberg tag analog) ------------------------------------------

REFS_NAME = "refs.json"


def load_refs(table_path: str) -> dict[str, int]:
    """name → pinned manifest version.  Tags are retention pins: GC
    (``expire_snapshots``) keeps a tagged version fully readable however
    old it gets — the "prod"/"audited-2026Q3" use case."""
    p = os.path.join(_mdir(table_path), REFS_NAME)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return {k: int(v) for k, v in json.load(f).items()}


def save_refs(table_path: str, refs: dict[str, int]) -> None:
    """Atomic replace of the refs file.  Tag updates are driver-side
    metadata ops (no CAS line: last-writer-wins on the whole ref SET is
    the documented semantic; table-state commits never touch this file)."""
    d = _mdir(table_path)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, REFS_NAME)
    tmp = f"{final}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump(refs, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, final)
