"""Native query-language frontends: MongoDB query JSON and Elasticsearch
query DSL, compiled to Catalyst Columns.

The reference accepts both languages at its edges: the V1/legacy path
parses Mongo query objects (`{q}` with :fields/:limit/:tmin/:tmax —
LegacyV1HadoopUtils.parseQueryObject:51-184) and the analytic input path
accepts raw ES DSL via `technology_override.es.query`
(ElasticsearchHadoopUtils.java:54-148). Here both compile into the same
Column expressions as the native DSL (functions/query.py), so every
frontend rides the same predicate-pushdown path.

Mongo operators: implicit-AND documents, $eq $ne $gt $gte $lt $lte $in
$nin $all $exists $not $and $or $nor, dotted paths.
ES operators: term, terms, range (gt/gte/lt/lte), exists, match,
match_all, ids, bool{must, filter, should, must_not}, nested and/or trees.
"""

from __future__ import annotations

from functools import reduce
from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aleph2_contrib_spark.functions.query import _field_type, _resolve


# ---------------------------------------------------------------------------
# MongoDB query documents
# ---------------------------------------------------------------------------

_MONGO_CMP = {"$gt": ">", "$gte": ">=", "$lt": "<", "$lte": "<="}


def _mongo_field_pred(schema, path: str, cond: Any) -> Column:
    col = _resolve(schema, path)
    ftype = _field_type(schema, path)
    is_array = isinstance(ftype, T.ArrayType)

    if not isinstance(cond, Mapping):
        # {field: literal} — equality; on array fields Mongo matches elements
        if is_array:
            return F.array_contains(col, cond)
        return col == F.lit(cond)

    preds: list[Column] = []
    for op, val in cond.items():
        if op == "$eq":
            preds.append(F.array_contains(col, val) if is_array else col == F.lit(val))
        elif op == "$ne":
            preds.append(col.isNull() | (col != F.lit(val)))
        elif op in _MONGO_CMP:
            sym = _MONGO_CMP[op]
            preds.append(
                col > F.lit(val) if sym == ">"
                else col >= F.lit(val) if sym == ">="
                else col < F.lit(val) if sym == "<"
                else col <= F.lit(val)
            )
        elif op == "$in":
            if is_array:
                preds.append(F.arrays_overlap(col, F.array(*[F.lit(v) for v in val])))
            else:
                preds.append(col.isin(list(val)))
        elif op == "$nin":
            preds.append(col.isNull() | ~col.isin(list(val)))
        elif op == "$all":
            if is_array:
                preds.append(reduce(lambda a, b: a & b, (F.array_contains(col, v) for v in val)))
            else:
                preds.append(reduce(lambda a, b: a & b, (col == F.lit(v) for v in val)))
        elif op == "$exists":
            preds.append(col.isNotNull() if val else col.isNull())
        elif op == "$not":
            # Mongo $not matches docs where the field does NOT match,
            # including missing/null fields — null-safe negation.
            preds.append(~F.coalesce(_mongo_field_pred(schema, path, val), F.lit(False)))
        elif op == "$regex":
            preds.append(col.rlike(str(val)))
        else:
            raise ValueError(f"unsupported mongo operator: {op}")
    return reduce(lambda a, b: a & b, preds)


def compile_mongo_query(query: Mapping[str, Any], schema: T.StructType | None = None) -> Column:
    """Mongo query document → Column (reference MongoDbUtils
    convertToMongoQuery:67-93 inverted: JSON → predicate)."""
    preds: list[Column] = []
    for key, val in query.items():
        if key == "$and":
            preds.append(reduce(lambda a, b: a & b, (compile_mongo_query(q, schema) for q in val)))
        elif key == "$or":
            preds.append(reduce(lambda a, b: a | b, (compile_mongo_query(q, schema) for q in val)))
        elif key == "$nor":
            # $nor matches docs failing every clause, incl. missing fields.
            preds.append(
                ~F.coalesce(
                    reduce(lambda a, b: a | b, (compile_mongo_query(q, schema) for q in val)),
                    F.lit(False),
                )
            )
        else:
            preds.append(_mongo_field_pred(schema, key, val))
    if not preds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, preds)


def apply_v1_query(
    df: DataFrame,
    q: Mapping[str, Any] | None = None,
    fields: Sequence[str] = (),
    limit: int | None = None,
    tmin: Any = None,
    tmax: Any = None,
    time_field: str | None = None,
) -> DataFrame:
    """The V1 scan surface (S10): `{q}` + :fields + :limit + :tmin/:tmax
    (reference LegacyV1HadoopUtils.java:51-184; date range → index/partition
    restriction :192-212)."""
    out = df
    if tmin is not None and time_field:
        out = out.filter(F.col(time_field) >= F.lit(tmin))
    if tmax is not None and time_field:
        out = out.filter(F.col(time_field) < F.lit(tmax))
    if q:
        out = out.filter(compile_mongo_query(q, df.schema))
    if fields:
        out = out.select(*fields)
    if limit is not None:
        out = out.limit(limit)
    return out


# ---------------------------------------------------------------------------
# Elasticsearch query DSL
# ---------------------------------------------------------------------------


def compile_es_query(query: Mapping[str, Any], schema: T.StructType | None = None) -> Column:
    """ES query DSL JSON → Column. Handles the filter-context subset the
    reference pushes down (`es.query`, ElasticsearchHadoopUtils.java:54-148)
    plus `match` with the same tokenized semantics as Q.text_match."""
    if not query:
        return F.lit(True)
    if "query" in query and len(query) == 1:
        return compile_es_query(query["query"], schema)
    if len(query) != 1:
        raise ValueError(f"es query node must have one key, got {list(query)}")
    kind, body = next(iter(query.items()))

    if kind == "match_all":
        return F.lit(True)
    if kind == "term":
        fld, val = next(iter(body.items()))
        if isinstance(val, Mapping):
            val = val["value"]
        col = _resolve(schema, fld)
        if isinstance(_field_type(schema, fld), T.ArrayType):
            return F.array_contains(col, val)
        return col == F.lit(val)
    if kind == "terms":
        fld, vals = next(iter(body.items()))
        col = _resolve(schema, fld)
        if isinstance(_field_type(schema, fld), T.ArrayType):
            return F.arrays_overlap(col, F.array(*[F.lit(v) for v in vals]))
        return col.isin(list(vals))
    if kind == "range":
        fld, bounds = next(iter(body.items()))
        col = _resolve(schema, fld)
        preds = []
        if "gt" in bounds:
            preds.append(col > F.lit(bounds["gt"]))
        if "gte" in bounds:
            preds.append(col >= F.lit(bounds["gte"]))
        if "lt" in bounds:
            preds.append(col < F.lit(bounds["lt"]))
        if "lte" in bounds:
            preds.append(col <= F.lit(bounds["lte"]))
        return reduce(lambda a, b: a & b, preds) if preds else F.lit(True)
    if kind == "exists":
        return _resolve(schema, body["field"]).isNotNull()
    if kind == "ids":
        return F.col("_id").isin(list(body["values"]))
    if kind == "match":
        fld, val = next(iter(body.items()))
        if isinstance(val, Mapping):
            operator = val.get("operator", "or")
            val = val["query"]
        else:
            operator = "or"
        toks = F.split(F.lower(_resolve(schema, fld)), r"\s+")
        preds = [F.array_contains(toks, t) for t in str(val).lower().split()]
        if not preds:
            return F.lit(True)
        combine = (lambda a, b: a & b) if operator == "and" else (lambda a, b: a | b)
        return reduce(combine, preds)
    if kind == "bool":
        parts: list[Column] = []
        for clause in body.get("must", []) if isinstance(body.get("must", []), list) else [body["must"]]:
            parts.append(compile_es_query(clause, schema))
        for clause in body.get("filter", []) if isinstance(body.get("filter", []), list) else [body["filter"]]:
            parts.append(compile_es_query(clause, schema))
        should = body.get("should", [])
        should = should if isinstance(should, list) else [should]
        if should:
            parts.append(reduce(lambda a, b: a | b, (compile_es_query(c, schema) for c in should)))
        must_not = body.get("must_not", [])
        must_not = must_not if isinstance(must_not, list) else [must_not]
        for clause in must_not:
            parts.append(~compile_es_query(clause, schema))
        if not parts:
            return F.lit(True)
        return reduce(lambda a, b: a & b, parts)
    raise ValueError(f"unsupported es query kind: {kind}")


def apply_es_query(df: DataFrame, query: Mapping[str, Any]) -> DataFrame:
    return df.filter(compile_es_query(query, df.schema))
