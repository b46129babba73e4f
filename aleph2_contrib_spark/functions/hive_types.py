"""Declared-schema type system: Hive DDL type strings ⇄ Spark types.

The reference's data-warehouse schema declares per-field Hive types and
validates them (allowed primitives + STRUCT/ARRAY/MAP/UNIONTYPE —
ElasticsearchHiveUtils.java:84-88, generatePartialHiveSchema:253-318);
it then emits a ``CREATE EXTERNAL TABLE`` DDL against the ES handler.

Here the same surface targets Spark: parse the declared type, build the
StructType, emit Spark-SQL DDL. UNIONTYPE has no Spark equivalent (SURVEY
§7.3) and maps to a struct of nullable alternatives ``{u0, u1, ...}`` —
documented, reversible, and queryable with coalesce(u0, u1, ...).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Hive primitive → Spark type (ElasticsearchHiveUtils.java:84-88 list)
_PRIMITIVES: dict[str, T.DataType] = {
    "TINYINT": T.ByteType(),
    "SMALLINT": T.ShortType(),
    "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(),
    "BOOLEAN": T.BooleanType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "STRING": T.StringType(),
    "BINARY": T.BinaryType(),
    "TIMESTAMP": T.TimestampType(),
    "DATE": T.DateType(),
}


class HiveTypeError(ValueError):
    pass


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "<" or ch == "(":
            depth += 1
        elif ch == ">" or ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def parse_hive_type(s: str) -> T.DataType:
    """Parse a Hive type string (case-insensitive) into a Spark DataType."""
    s = s.strip()
    up = s.upper()
    if up in _PRIMITIVES:
        return _PRIMITIVES[up]
    if up.startswith("DECIMAL"):
        if "(" in s:
            args = s[s.index("(") + 1 : s.rindex(")")].split(",")
            return T.DecimalType(int(args[0]), int(args[1]) if len(args) > 1 else 0)
        return T.DecimalType(10, 0)
    if up.startswith("VARCHAR") or up.startswith("CHAR"):
        return T.StringType()
    if up.startswith("ARRAY<") and up.endswith(">"):
        return T.ArrayType(parse_hive_type(s[6:-1]))
    if up.startswith("MAP<") and up.endswith(">"):
        k, v = _split_top_level(s[4:-1])
        key_type = parse_hive_type(k)
        if not isinstance(key_type, (T.StringType, T.IntegerType, T.LongType)):
            # reference restricts map keys to primitives; we allow the common ones
            pass
        return T.MapType(key_type, parse_hive_type(v))
    if up.startswith("STRUCT<") and up.endswith(">"):
        fields = []
        for part in _split_top_level(s[7:-1]):
            if ":" not in part:
                raise HiveTypeError(f"bad struct field: {part!r}")
            fname, ftype = part.split(":", 1)
            fields.append(T.StructField(fname.strip(), parse_hive_type(ftype), True))
        return T.StructType(fields)
    if up.startswith("UNIONTYPE<") and up.endswith(">"):
        # struct-of-nullable-alternatives encoding (SURVEY §7.3)
        alts = _split_top_level(s[10:-1])
        return T.StructType(
            [T.StructField(f"u{i}", parse_hive_type(a), True) for i, a in enumerate(alts)]
        )
    raise HiveTypeError(f"unsupported Hive type: {s!r}")


def parse_hive_schema(fields: dict[str, str]) -> T.StructType:
    """{field_name: hive_type_string} → StructType (declared path §1.2)."""
    return T.StructType(
        [T.StructField(name, parse_hive_type(ht), True) for name, ht in fields.items()]
    )


def _spark_to_hive(dt: T.DataType) -> str:
    rev = {
        T.ByteType: "TINYINT", T.ShortType: "SMALLINT", T.IntegerType: "INT",
        T.LongType: "BIGINT", T.BooleanType: "BOOLEAN", T.FloatType: "FLOAT",
        T.DoubleType: "DOUBLE", T.StringType: "STRING", T.BinaryType: "BINARY",
        T.TimestampType: "TIMESTAMP", T.DateType: "DATE",
    }
    if type(dt) in rev:
        return rev[type(dt)]
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"ARRAY<{_spark_to_hive(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"MAP<{_spark_to_hive(dt.keyType)},{_spark_to_hive(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(f"{f.name}:{_spark_to_hive(f.dataType)}" for f in dt.fields)
        return f"STRUCT<{inner}>"
    raise HiveTypeError(f"cannot render {dt}")


def generate_create_table_ddl(
    table: str,
    schema: T.StructType,
    location: str | None = None,
    partition_cols: list[str] | None = None,
) -> str:
    """CREATE TABLE DDL from a schema — the Spark-side replacement for
    generateFullHiveSchema (external table over the store)."""
    parts = set(partition_cols or [])
    cols = ",\n  ".join(
        f"`{f.name}` {_spark_to_hive(f.dataType)}" for f in schema.fields if f.name not in parts
    )
    ddl = f"CREATE TABLE {table} (\n  {cols}\n) USING parquet"
    if partition_cols:
        ddl += "\nPARTITIONED BY (" + ", ".join(f"`{c}`" for c in partition_cols) + ")"
    if location:
        ddl += f"\nLOCATION '{location}'"
    return ddl
