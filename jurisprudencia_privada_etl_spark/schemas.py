"""Table schemas and the epoch-scoped schema-evolution manifest.

Authoritative shapes (SURVEY.md §1.3, BASELINE.json input_hint):

changelog(epoch BIGINT, ordinal BIGINT, op STRING, repo STRING, path STRING,
          commit STRING, lang STRING, content STRING)        partitioned by epoch
target  (repo STRING, path STRING, commit STRING, lang STRING, content STRING)
          primary key (repo, path)
          + bookkeeping: ordinal BIGINT, content_sha STRING = sha2(content, 256)

The reference's schema is dynamic (PartialJurisprudenciaDocument, typed only
by the ES mapping — reference src/report/report.ts:14-21); here schemas are
explicit StructTypes and evolution is a first-class, epoch-scoped operation
(SURVEY.md §2.8 T6).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"

KEY_COLUMNS = ["repo", "path"]
ORDINAL_COLUMN = "ordinal"

CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.LongType(), False),
        T.StructField("ordinal", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

TARGET_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

# Bookkeeping columns the sink maintains alongside the payload.
BOOKKEEPING_COLUMNS = ["ordinal", "content_sha"]


@dataclass(frozen=True)
class ColumnSpec:
    """A column with a stable id — renames keep the id (Iceberg-style)."""

    col_id: int
    name: str
    dtype: str  # Spark simpleString, e.g. "string", "bigint", "int"

    def to_json(self) -> dict:
        return {"id": self.col_id, "name": self.name, "type": self.dtype}

    @staticmethod
    def from_json(d: dict) -> "ColumnSpec":
        return ColumnSpec(int(d["id"]), d["name"], d["type"])


@dataclass
class TableSchema:
    """Ordered column list with stable ids; supports add/rename/widen/drop.

    The emulated lake sink has no Iceberg column-id tracking for free, so it
    is carried here explicitly (SURVEY.md §7.3 item 5): a rename maps an
    existing id to a new name; an add allocates a fresh id.  Data files are
    written with the names current at write time; readers map file columns
    back to current names by id via the per-snapshot name history.

    ``last_column_id`` is the high-water mark of every id ever allocated
    (Iceberg's ``last-column-id`` table-metadata field) — WITHOUT it,
    dropping the max-id column and adding a new one would REUSE the dropped
    id, and the by-id reader would resurrect the dropped column's bytes
    from old data files under the new column's name.
    """

    columns: list[ColumnSpec] = field(default_factory=list)
    last_column_id: int = 0

    def __post_init__(self) -> None:
        self.last_column_id = max(
            self.last_column_id, max((c.col_id for c in self.columns), default=0)
        )

    @staticmethod
    def from_struct(st: T.StructType) -> "TableSchema":
        return TableSchema(
            [ColumnSpec(i + 1, f.name, f.dataType.simpleString()) for i, f in enumerate(st.fields)]
        )

    def names(self) -> list[str]:
        return [c.name for c in self.columns]

    def next_id(self) -> int:
        return max(
            self.last_column_id, max((c.col_id for c in self.columns), default=0)
        ) + 1

    def add_column(self, name: str, dtype: str) -> None:
        if name in self.names():
            return  # idempotent: re-applying an epoch's evolution is a no-op
        cid = self.next_id()
        self.columns.append(ColumnSpec(cid, name, dtype))
        self.last_column_id = cid

    def drop_column(self, name: str) -> None:
        """Metadata-only column drop (Iceberg ``ALTER TABLE .. DROP COLUMN``):
        data files keep the bytes, readers stop projecting the id.  A later
        re-add of the same NAME allocates a fresh id, so old files' values
        never resurrect — they read as null under the new id.  Keys are the
        table's identity and the merge's join columns; dropping one is
        always a modeling error, so it raises.  Idempotent: dropping an
        absent column is a no-op (crash-replayed epoch evolutions re-apply)."""
        if name in KEY_COLUMNS:
            raise ValueError(f"cannot drop key column {name!r}")
        self.columns = [c for c in self.columns if c.name != name]

    def widen_column(self, name: str, dtype: str) -> None:
        """Promote a column to a wider type (Iceberg's safe-evolution set:
        int→bigint, float→double, decimal precision growth at the same
        scale).  Data files keep their written type; readers cast on the
        id-mapped load — metadata-only, like add/rename.  Idempotent, and
        anything outside the safe set (narrowing, cross-family) raises:
        a lossy cast silently corrupting 10^10 rows is the failure mode
        this guard exists for."""
        for i, c in enumerate(self.columns):
            if c.name != name:
                continue
            if c.dtype == dtype:
                return  # idempotent re-apply
            if not _widens(c.dtype, dtype):
                raise ValueError(f"illegal widen {c.dtype!r} → {dtype!r} for column {name!r}")
            self.columns[i] = ColumnSpec(c.col_id, c.name, dtype)
            return
        raise ValueError(f"widen: no column {name!r} in {self.names()}")

    def rename_column(self, old: str, new: str) -> None:
        names = self.names()
        if old not in names:
            if new in names:
                return  # already applied (idempotent re-run)
            raise ValueError(f"rename: no column {old!r} in {names}")
        self.columns = [
            ColumnSpec(c.col_id, new, c.dtype) if c.name == old else c for c in self.columns
        ]

    def to_struct(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.name, _parse_type(c.dtype), True) for c in self.columns]
        )

    def to_json(self) -> dict:
        return {
            "columns": [c.to_json() for c in self.columns],
            "last_column_id": self.last_column_id,
        }

    @staticmethod
    def from_json(data: list[dict] | dict) -> "TableSchema":
        if isinstance(data, list):  # pre-drop manifests: bare column list
            return TableSchema([ColumnSpec.from_json(c) for c in data])
        return TableSchema(
            [ColumnSpec.from_json(c) for c in data["columns"]],
            last_column_id=int(data.get("last_column_id", 0)),
        )


_CANON = {"long": "bigint", "integer": "int", "short": "smallint"}
_WIDENS = {
    ("smallint", "int"), ("smallint", "bigint"), ("int", "bigint"),
    ("float", "double"),
}


def _widens(frm: str, to: str) -> bool:
    """Iceberg's safe type-promotion set (spec §Schema Evolution):
    int→long, float→double, decimal(P,S)→decimal(P2,S) with P2 ≥ P."""
    frm, to = _CANON.get(frm, frm), _CANON.get(to, to)
    if (frm, to) in _WIDENS:
        return True
    if frm.startswith("decimal(") and to.startswith("decimal("):
        (p1, s1), (p2, s2) = (
            tuple(int(x) for x in d[8:-1].split(",")) for d in (frm, to)
        )
        return s1 == s2 and p2 >= p1
    return False


def _parse_type(s: str) -> T.DataType:
    # Covers the scalar types the engine uses; complex types go through DDL.
    simple = {
        "string": T.StringType(),
        "bigint": T.LongType(),
        "long": T.LongType(),
        "int": T.IntegerType(),
        "integer": T.IntegerType(),
        "double": T.DoubleType(),
        "float": T.FloatType(),
        "boolean": T.BooleanType(),
        "date": T.DateType(),
        "timestamp": T.TimestampType(),
        "binary": T.BinaryType(),
    }
    if s in simple:
        return simple[s]
    return T._parse_datatype_string(s)  # arrays/structs/maps via DDL string


@dataclass(frozen=True)
class SchemaChange:
    """One evolution step attached to an epoch (applied BEFORE its merge)."""

    kind: str  # "add" | "rename" | "widen" | "drop"
    name: str  # new column name (add) / old name (rename) / column (widen/drop)
    dtype: str | None = None  # for add / widen (the new, wider type)
    new_name: str | None = None  # for rename

    def to_json(self) -> dict:
        return {"kind": self.kind, "name": self.name, "dtype": self.dtype, "new_name": self.new_name}

    @staticmethod
    def from_json(d: dict) -> "SchemaChange":
        return SchemaChange(d["kind"], d["name"], d.get("dtype"), d.get("new_name"))


def apply_changes(schema: TableSchema, changes: list[SchemaChange]) -> TableSchema:
    out = TableSchema(list(schema.columns), last_column_id=schema.last_column_id)
    for ch in changes:
        if ch.kind == "add":
            out.add_column(ch.name, ch.dtype or "string")
        elif ch.kind == "rename":
            out.rename_column(ch.name, ch.new_name or ch.name)
        elif ch.kind == "widen":
            if not ch.dtype:
                raise ValueError("widen requires dtype")
            out.widen_column(ch.name, ch.dtype)
        elif ch.kind == "drop":
            out.drop_column(ch.name)
        else:
            raise ValueError(f"unknown schema change kind {ch.kind!r}")
    return out
