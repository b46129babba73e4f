"""Gate-boundary type discipline: exact wide integers cross the
engine/oracle comparison boundary as STRINGS, never as DECIMAL.

Why this module exists: the repo's fixed-point operators (covariance /
correlation / assortativity numerators, join-size products) carry exact
integer sums that can exceed int64 at corpus scale, so internally they
compute in Spark DECIMAL(38,0) (DuckDB HUGEINT on the oracle side).
That exactness is correct — but DECIMAL must never be an *output*
column of a registered gate: the driver's pandas canonicalizer renders
wide-decimal columns differently per engine (Spark's decimal(38,0) and
DuckDB's DECIMAL(38,0) both arrive value-identical yet hash-mismatch —
the round-6 ``join_point_in_interval`` / round-8 covariance-family
failure class).

The fix is representation, not math: at the gate boundary every decimal
column is re-emitted as its exact digit string ("-123456…", no exponent,
no trailing scale) on BOTH the Spark and DuckDB sides. Digit strings
are exact at ANY magnitude — unlike a BIGINT cast, which would be safe
only at test scale and silently overflow at the 100 TB scale these
operators are documented for.

Enforced by ``tests/test_oracle_hygiene.py``: DECIMAL is banned from
both the oracle DESCRIBE types and the Spark ``queries()`` schemas, so
this class of driver red cannot recur.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stringify_decimals(df: DataFrame) -> DataFrame:
    """Cast every DecimalType column of ``df`` to its exact digit string.

    Spark's decimal-to-string cast renders scale-0 decimals as plain
    digits (``"123"`` / ``"-123"`` — no exponent, no decimal point), the
    same rendering DuckDB's ``CAST(x AS VARCHAR)`` produces for HUGEINT
    and DECIMAL(38,0), so a value-identical result is byte-identical
    across engines. Non-decimal columns pass through untouched; column
    order is preserved (the driver sorts by name, but plans stay
    readable).
    """
    return df.select(
        *[
            F.col(f.name).cast("string").alias(f.name)
            if isinstance(f.dataType, T.DecimalType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def varchar_wrap(sql: str, cols: list[str], dec_cols: set[str]) -> str:
    """DuckDB twin of :func:`stringify_decimals`: wrap ``sql`` in one
    outer SELECT that re-emits every column in ``dec_cols`` as
    ``CAST(col AS VARCHAR)`` (exact digits) and passes the rest through.
    ``cols`` is the full output column list in order, so the wrapper
    never changes the result shape.
    """
    select = ", ".join(
        f"CAST({c} AS VARCHAR) AS {c}" if c in dec_cols else c for c in cols
    )
    return f"SELECT {select} FROM (\n{sql}\n)"
