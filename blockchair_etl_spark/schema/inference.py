"""Sample-based schema inference with a widen-only evolution ratchet.

Re-expresses the reference's inference subsystem
(`scripts/python/generate_snowflake_ddl.py`: decision tree :334-405,
date detection :196-218, varchar tier walk :177-193, widening ratchet
:261-331, DDL emit/parse :221-258,408-432; tier/format config
`config/ddl_config.json`) with a typed model instead of DDL strings:

- Sampling runs through Spark (`limit(n)` over the TSV scan → Arrow →
  pandas), so the sample path scales to files of any size and any
  storage — only ≤n rows ever reach the driver.
- Column types are a small algebra (`ColumnType`) with an explicit
  widening partial order; the ratchet replaces a stored schema only if
  the new one is wider on ≥1 column and narrower on none.
- Persistence is JSON (the schema registry), with Spark `StructType`
  and `CREATE TABLE` DDL emitted from the same model.

Decision tree per column, matching the reference's semantics:
date/timestamp format match (DATE iff the format has no time part) →
all-null → VARCHAR(default 64) → integer → float → boolean →
VARCHAR(smallest tier ≥ max observed length).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.types import (
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DEFAULT_STRING_LENGTH = 64
VARCHAR_TIERS = [
    16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192,
    16384, 32768, 65536, 131072, 262144,
]
DATE_FORMATS = ["%Y-%m-%d", "%Y/%m/%d", "%d-%m-%Y"]
TIMESTAMP_FORMATS = ["%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M:%S.%f"]
MAX_VARCHAR = 16_777_216  # length of an unbounded VARCHAR for ordering


@dataclass(frozen=True)
class ColumnType:
    """One inferred type: kind ∈ {integer, float, boolean, date,
    timestamp, varchar}; length set only for varchar."""

    kind: str
    length: int | None = None

    def widens(self, old: "ColumnType") -> bool | None:
        """True if self is strictly wider than old, False if equal,
        None if incomparable (narrower or mismatched kinds)."""
        if self == old:
            return False
        if self.kind == "varchar" and old.kind == "varchar":
            new_len = self.length or MAX_VARCHAR
            old_len = old.length or MAX_VARCHAR
            if new_len > old_len:
                return True
            return False if new_len == old_len else None
        if old.kind == "integer" and self.kind == "float":
            return True
        if old.kind == "date" and self.kind == "timestamp":
            return True
        return None

    def to_spark(self) -> DataType:
        return {
            "integer": LongType(),
            "float": DoubleType(),
            "boolean": BooleanType(),
            "date": DateType(),
            "timestamp": TimestampType(),
            "varchar": StringType(),
        }[self.kind]

    def ddl(self) -> str:
        if self.kind == "varchar":
            return f"VARCHAR({self.length})" if self.length else "VARCHAR"
        return {"integer": "BIGINT", "float": "DOUBLE"}.get(self.kind, self.kind.upper())


Schema = list[tuple[str, ColumnType]]


def sanitize_column_name(name: str, position: int = 0) -> str:
    """Non-alphanumerics → '_', uppercase, strip edge '_', prefix COL_
    when the result is empty or starts with a non-letter
    (generate_snowflake_ddl.py:375-377)."""
    out = re.sub(r"[^a-zA-Z0-9]", "_", name).upper().strip("_")
    if not out:
        return f"COL_{position}"
    if not out[0].isalpha():
        return f"COL_{out}"
    return out


def varchar_tier(max_length: int | None) -> int:
    if max_length is None:
        return DEFAULT_STRING_LENGTH
    for tier in VARCHAR_TIERS:
        if max_length <= tier:
            return tier
    return VARCHAR_TIERS[-1]


def detect_datetime(series: pd.Series) -> ColumnType | None:
    """First matching format wins; DATE iff the format carries no
    hour/minute directive (generate_snowflake_ddl.py:196-218)."""
    sample = series.dropna().astype(str).head(100)
    if sample.empty:
        return None
    for fmt in DATE_FORMATS + TIMESTAMP_FORMATS:
        try:
            pd.to_datetime(sample, format=fmt, errors="raise")
        except (ValueError, TypeError):
            continue
        is_date = "H" not in fmt and "M" not in fmt.replace("%m", "")
        return ColumnType("date" if is_date else "timestamp")
    return None


def infer_from_pandas(df: pd.DataFrame) -> Schema:
    """The per-column decision tree over a driver-side sample frame."""
    schema: Schema = []
    for pos, col in enumerate(df.columns):
        name = sanitize_column_name(str(col), pos)
        s = df[col]
        dt = detect_datetime(s)
        if dt is not None:
            ct = dt
        elif s.isna().all():
            ct = ColumnType("varchar", DEFAULT_STRING_LENGTH)
        elif pd.api.types.is_integer_dtype(s.dtype):
            ct = ColumnType("integer")
        elif pd.api.types.is_float_dtype(s.dtype):
            ct = ColumnType("float")
        elif pd.api.types.is_bool_dtype(s.dtype):
            ct = ColumnType("boolean")
        else:
            max_len = s.dropna().astype(str).str.len().max()
            ct = ColumnType("varchar", varchar_tier(int(max_len) if pd.notna(max_len) else None))
        schema.append((name, ct))
    return schema


def infer_from_tsv(
    spark: SparkSession, path: str, sample_rows: int = 1_000_000
) -> Schema:
    """Sample ≤sample_rows through a Spark TSV scan (all strings — the
    decision tree, not the CSV parser, assigns types) and infer."""
    raw = (
        spark.read.option("sep", "\t")
        .option("header", "true")
        .option("inferSchema", "false")
        .csv(path)
        .limit(sample_rows)
    )
    pdf = raw.toPandas()
    # pandas-typed sample: re-parse strings to the narrowest dtype so the
    # dtype checks below behave like the reference's pd.read_csv.
    for col in pdf.columns:
        parsed = pd.to_numeric(pdf[col], errors="coerce")
        if parsed.notna().sum() == pdf[col].notna().sum():
            if (parsed.dropna() % 1 == 0).all() and not pdf[col].dropna().astype(
                str
            ).str.contains(r"[.eE]").any():
                parsed = parsed.astype("Int64")
            pdf[col] = parsed
    return infer_from_pandas(pdf)


class SchemaSkip(Exception):
    """New schema is not a strict widening — keep the stored one
    (the reference signals this via SchemaSkipError + nonzero exit)."""


def apply_ratchet(new: Schema, old: Schema | None) -> Schema:
    """Widen-only evolution (compare_schemas, :261-331): keep old unless
    new is wider on some common column and narrower/mismatched on none.
    No stored schema, or no common columns → accept new."""
    if not old:
        return new
    old_d = dict(old)
    new_d = dict(new)
    common = set(old_d) & set(new_d)
    if not common:
        return new
    widened = False
    for col in common:
        w = new_d[col].widens(old_d[col])
        if w is None:
            raise SchemaSkip(f"column {col}: {new_d[col]} does not widen {old_d[col]}")
        widened = widened or w
    if not widened:
        raise SchemaSkip("all common column types equal — keeping stored schema")
    return new


def to_struct_type(schema: Schema) -> StructType:
    return StructType(
        [
            StructField(
                name,
                ct.to_spark(),
                True,
                metadata={"max_length": ct.length} if ct.kind == "varchar" else {},
            )
            for name, ct in schema
        ]
    )


def emit_ddl(table: str, schema: Schema) -> str:
    if not re.match(r"^[a-zA-Z][a-zA-Z0-9_]*$", table):
        raise ValueError(f"invalid table name: {table}")
    cols = ",\n    ".join(f"{name} {ct.ddl()}" for name, ct in schema)
    return f"CREATE OR REPLACE TABLE {table} (\n    {cols}\n) USING parquet;"


def to_json(schema: Schema) -> str:
    return json.dumps(
        [{"name": n, "kind": c.kind, "length": c.length} for n, c in schema]
    )


def from_json(text: str) -> Schema:
    return [
        (d["name"], ColumnType(d["kind"], d.get("length"))) for d in json.loads(text)
    ]


class SchemaRegistry:
    """JSON-file-backed registry applying the ratchet on every update
    (the reference's --output-schema-json + compare flow, :522-528)."""

    def __init__(self, path: str):
        self.path = path
        try:
            with open(path) as f:
                self._schemas: dict[str, Schema] = {
                    t: from_json(json.dumps(s)) for t, s in json.load(f).items()
                }
        except FileNotFoundError:
            self._schemas = {}

    def get(self, table: str) -> Schema | None:
        return self._schemas.get(table)

    def update(self, table: str, new: Schema) -> Schema:
        accepted = apply_ratchet(new, self._schemas.get(table))
        self._schemas[table] = accepted
        self._save()
        return accepted

    def _save(self) -> None:
        with open(self.path, "w") as f:
            json.dump(
                {
                    t: [{"name": n, "kind": c.kind, "length": c.length} for n, c in s]
                    for t, s in self._schemas.items()
                },
                f,
                indent=2,
            )
