"""SQL-surface registration of the engine's scalar functions (U5).

The reference exposes its scalar helpers to SQL jobs through Hive UDF
registration (SparkSqlTopology registers inputs as tables and lets users
run plain SQL over them). Spark-first equivalent: SQL *scalar functions*
(`CREATE OR REPLACE TEMPORARY FUNCTION ... RETURNS ... RETURN <expr>`,
Spark 3.5+). These are INLINED into the plan at resolution time, so they
codegen exactly like the Column-API forms — no UDF call overhead, full
pushdown/CSE — and any SQL-passthrough stage can call them.

Every definition here mirrors a Column function elsewhere in the package
(parity pytest-asserted): a2_fingerprint ≡ dedup.fingerprint,
a2_token_count ≡ text.token_count, a2_md5_unit/a2_keep ≡
corpus.md5_unit/hash_sample's predicate.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, return type, body expression)
_SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    # canonical text form + document fingerprint (dedup.normalize_text/fingerprint)
    "a2_normalize": (
        "(x STRING)", "STRING",
        r"trim(regexp_replace(lower(x), '\\s+', ' '))",
    ),
    "a2_fingerprint": (
        "(x STRING)", "STRING",
        r"md5(trim(regexp_replace(lower(x), '\\s+', ' ')))",
    ),
    # whitespace token count (text.token_count)
    "a2_token_count": (
        "(x STRING)", "INT",
        r"CASE WHEN trim(x) = '' THEN 0 ELSE size(split(trim(x), '\\s+')) END",
    ),
    # distinct-token ratio quality signal, fixed-point f6
    "a2_distinct_token_ratio_f6": (
        "(x STRING)", "BIGINT",
        r"""CASE WHEN trim(x) = '' THEN 0
            ELSE CAST(floor(size(array_distinct(split(lower(trim(x)), '\\s+')))
                      / size(split(lower(trim(x)), '\\s+')) * 1000000.0) AS BIGINT) END""",
    ),
    # deterministic uniform [0,1) draw from md5(seed:key) (corpus.md5_unit)
    "a2_md5_unit": (
        "(key STRING, seed STRING)", "DOUBLE",
        "CAST(conv(substring(md5(concat_ws(':', seed, key)), 1, 8), 16, 10) AS DOUBLE)"
        " / 4294967296.0",
    ),
    # deterministic sampling predicate (corpus.hash_sample)
    "a2_keep": (
        "(key STRING, rate DOUBLE, seed STRING)", "BOOLEAN",
        "CAST(conv(substring(md5(concat_ws(':', seed, key)), 1, 8), 16, 10) AS DOUBLE)"
        " / 4294967296.0 < rate",
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register all engine scalar functions as temporary SQL functions;
    returns the registered names."""
    for name, (sig, ret, body) in _SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURNS {ret} RETURN {body}"
        )
    return list(_SQL_FUNCTIONS)
