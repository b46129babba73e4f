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
# cannot produce at all): int128 and all unsigned widths.
UNSTABLE = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")


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
