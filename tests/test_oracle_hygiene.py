"""Oracle type-hygiene lint: every ``oracle_sql()`` entry must bind on
DuckDB and produce only engine-stable result column types.

Why: the driver hashes Spark and DuckDB results through a pandas
canonicalizer. DuckDB widens integer aggregates beyond what Spark can
express — ``sum(BIGINT)`` returns HUGEINT (int128), rendered as
``decimal.Decimal``/object in pandas while Spark's BIGINT renders as
int64 — so a value-identical result hash-mismatches (this exact class
cost the round-6 ``join_point_in_interval`` gate; VERDICT r6 item 1).
Unsigned types have the same render-divergence risk. The fix pattern is
always ``CAST(sum(...) AS BIGINT)`` (or DOUBLE) in the oracle.

``DESCRIBE (sql)`` binds and type-checks without executing, so linting
all ~200 oracles takes seconds and doubles as a bind-error smoke test
for every oracle in the registry.
"""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Types pandas renders differently from any Spark type (or that Spark
# cannot produce at all): int128, all unsigned widths, and — since the
# round-8 covariance-family reds — DECIMAL of any width: the driver's
# pandas canonicalizer renders wide decimals differently per engine, so
# even a value-exact Decimal-vs-Decimal result hash-mismatches. Exact
# wide integers cross the gate boundary as BIGINT (when range-safe) or
# exact digit strings (functions/gate_types.py), never as DECIMAL.
UNSTABLE = (
    "HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT",
    "DECIMAL",
)


@pytest.fixture(scope="module")
def oracle_types():
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    out = {}
    for name, sql in entrymod.oracle_sql().items():
        out[name] = con.execute(f"DESCRIBE ({sql})").fetchall()
    con.close()
    return out


def test_every_oracle_binds_and_has_stable_types(oracle_types):
    assert len(oracle_types) > 150  # the registry, not a stub
    offenders = []
    for name, desc in oracle_types.items():
        for col, typ, *_ in desc:
            up = typ.upper()
            if any(u in up for u in UNSTABLE):
                offenders.append((name, col, typ))
    assert not offenders, (
        "oracle result columns with engine-unstable types — add an explicit "
        f"CAST (e.g. CAST(sum(x) AS BIGINT)): {offenders}"
    )


def test_oracles_and_queries_keys_align(oracle_types):
    import __spark_entry__ as entrymod

    qnames = set(entrymod.queries())
    onames = set(oracle_types)
    # every oracle must correspond to a registered query; queries without
    # an oracle are the documented weaker rows-only class
    assert onames <= qnames, f"orphan oracles: {sorted(onames - qnames)}"


# -- Spark-side schema lint ---------------------------------------------------
# The oracle DESCRIBE lint above covers only the DuckDB half of the gate;
# round 8 proved the Spark half can diverge on its own (four operators
# emitted decimal(38,0) columns the driver's canonicalizer rendered
# differently per engine while every oracle passed the lint). Assert that
# every registered queries() entry's OUTPUT schema uses only types a
# pandas canonicalizer renders identically from Spark and DuckDB.

_SAFE_ATOMIC = None


def _safe_spark_type(dt):
    from pyspark.sql import types as T

    global _SAFE_ATOMIC
    if _SAFE_ATOMIC is None:
        _SAFE_ATOMIC = (
            T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.StringType, T.BooleanType,
            T.DateType, T.TimestampType, T.TimestampNTZType,
        )
    if isinstance(dt, _SAFE_ATOMIC):
        return True
    if isinstance(dt, T.ArrayType):
        return _safe_spark_type(dt.elementType)
    return False


def test_every_query_schema_is_gate_stable(spark, sf_dir):
    """Build (analyze only — no collect beyond what a gate's own driver
    path runs) every queries() DataFrame at sf0.001 and reject any output
    column whose type is outside the engine-stable set: DECIMAL is the
    round-8 class, MAP/STRUCT/BINARY would be the next ones."""
    import __spark_entry__ as entrymod

    offenders = []
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        for f in df.schema.fields:
            if not _safe_spark_type(f.dataType):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, (
        "queries() output columns with engine-unstable Spark types — "
        "re-emit as int/bigint/double/string/date/timestamp/boolean "
        "(functions/gate_types.stringify_decimals for exact wide sums): "
        f"{offenders}"
    )
