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

import datetime as dt
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
# V1 legacy query-object parsing: relative dates, ObjectId ranges,
# community/:srctags/soft-delete injection
# (reference LegacyV1HadoopUtils.parseQueryObject:51-184 and the helpers it
# C/P'd from V1: parseMinMaxDates:286-398, getInterval:405-437,
# parseDate:446-468, createDateRange:192-212)
# ---------------------------------------------------------------------------

_V1_UNIT_MS = {
    "h": 3_600_000,
    "d": 86_400_000,
    "w": 7 * 86_400_000,
    "m": 30 * 86_400_000,
    "y": 365 * 86_400_000,
}

# Python strptime renderings of the reference's _allowedDatesArray
# (LegacyV1HadoopUtils.java:448-459); tried in order.
_V1_DATE_FORMATS = (
    "%Y-%j",
    "%Y-%m-%d",
    "%Y%m%d",
    "%d %b %Y",
    "%d %b %y",
    "%m/%d/%y",
    "%m/%d/%Y",
    "%m.%d.%y",
    "%m.%d.%Y",
    "%Y-%m-%d %H:%M:%S",
    "%d %b %y %H:%M:%S",
    "%d %b %Y %H:%M:%S",
    "%m/%d/%y %H:%M:%S",
    "%m/%d/%Y %H:%M:%S",
    "%m.%d.%y %H:%M:%S",
    "%m.%d.%Y %H:%M:%S",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%dT%H:%M:%S%z",
    "%a, %d %b %Y %H:%M:%S %z",
)

_DAY_MS = 86_400_000


def _v1_interval_ms(interval: str, default_unit: str = "d") -> int:
    """``N[hdwmy]`` / ``month`` → milliseconds (getInterval:405-437)."""
    if interval == "month":
        return 30 * 86_400_000
    last = interval[-1]
    if last.isalpha():
        return int(interval[:-1]) * _V1_UNIT_MS[last]
    return int(interval) * _V1_UNIT_MS[default_unit]


def _v1_parse_date_ms(s: str) -> int:
    """Fixed-format date string → epoch ms, trying the reference's format
    list in order (parseDate:446-468). All naive stamps are UTC."""
    for fmt in _V1_DATE_FORMATS:
        try:
            parsed = dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
        if parsed.tzinfo is None:
            parsed = parsed.replace(tzinfo=dt.timezone.utc)
        return int(parsed.timestamp() * 1000)
    raise ValueError(f"unparseable V1 date: {s!r}")


def _v1_time_term_ms(term: Any, now_ms: int, *, is_max: bool) -> int:
    """One :tmin/:tmax value → epoch ms (parseMinMaxDates:286-398 +
    dateStringFromObject:220-252). Accepts epoch numbers, ``now``/
    ``midnight`` ± ``N[hdwmy]`` relative forms, ``{"$date": ...}``
    wrappers, datetimes, and the fixed-format list. Day-only max values
    extend to end-of-day (23:59:59.999, :357-371)."""
    if isinstance(term, bool):
        raise ValueError("boolean is not a V1 time term")
    if isinstance(term, (int, float)):
        return int(term)
    if isinstance(term, dt.datetime):
        if term.tzinfo is None:
            term = term.replace(tzinfo=dt.timezone.utc)
        return int(term.timestamp() * 1000)
    if isinstance(term, Mapping):
        return _v1_time_term_ms(term["$date"], now_ms, is_max=is_max)
    s = str(term)
    midnight_ms = now_ms - now_ms % _DAY_MS
    if s == "now":
        return now_ms
    if s.startswith("now"):
        sgn = -1 if s[3] == "-" else 1
        return now_ms + sgn * _v1_interval_ms(s[4:])
    if s == "midnight":
        return midnight_ms
    if s.startswith("midnight"):
        sgn = -1 if s[8] == "-" else 1
        return midnight_ms + sgn * _v1_interval_ms(s[9:])
    try:
        n = int(s)
        if n > 99_999_999:  # epoch ms; smaller is more likely YYYYMMDD
            return n
        ms = _v1_parse_date_ms(s)
    except ValueError:
        ms = _v1_parse_date_ms(s)
        if is_max and ":" in s:  # full timestamp — no day extension
            return ms
    if is_max:  # day-only max → entire day (:357-359, :367-371)
        ms = ms - ms % _DAY_MS + _DAY_MS - 1
    return ms


def parse_min_max_dates(
    tmin: Any = None, tmax: Any = None, now_ms: int | None = None
) -> tuple[int | None, int | None]:
    """(:tmin, :tmax) → (min_ms, max_ms), swapped if inverted
    (parseMinMaxDates:391-395). ``now_ms`` pins relative terms for
    deterministic replay."""
    if now_ms is None:
        now_ms = int(dt.datetime.now(dt.timezone.utc).timestamp() * 1000)
    lo = None if tmin in (None, "") else _v1_time_term_ms(tmin, now_ms, is_max=False)
    hi = None if tmax in (None, "") else _v1_time_term_ms(tmax, now_ms, is_max=True)
    if lo is not None and hi is not None and lo > hi:
        lo, hi = hi, lo
    return lo, hi


def objectid_bound(ms: int) -> str:
    """Epoch ms → the 24-hex ObjectId range boundary whose leading 4 bytes
    are the epoch-seconds timestamp and whose machine/counter bytes are
    zero (createDateRange:192-212 builds ``new ObjectId(date)`` bounds; the
    timestamp prefix is what makes lexicographic hex compare == time
    compare)."""
    return f"{ms // 1000:08x}" + "0" * 16


_V1_CONTROL_KEYS = (
    ":limit", ":splits", ":docsPerSplit", ":fields", ":output", ":reducers",
    ":mapper_key_class", ":mapper_value_class", ":caches", ":srctags",
    ":tmin", ":tmax",
)


def parse_v1_query_object(
    query: Mapping[str, Any],
    community_ids: Sequence[Any] | None = None,
    now_ms: int | None = None,
    id_field: str = "_id",
    community_field: str = "communityId",
    index_field: str = "index",
    soft_delete: bool = True,
) -> dict[str, Any]:
    """The full V1 query-object envelope (parseQueryObject:51-184): strip
    the ``:control`` keys, then inject the server-side restrictions the
    reference adds to every scan —

    - community visibility: ``communityId $in [...]`` (:154)
    - :tmin/:tmax → an ObjectId range on ``_id`` (:155-157, the V1 trick of
      using the ObjectId's embedded creation timestamp as the time index)
    - soft-delete exclusion: ``index != "?DEL?"`` (:158-159)
    - ``:srctags`` → a separate source-level tag query (:91-94), returned
      for the caller to resolve against the source dimension

    Returns {"q": mongo-query-dict, "srctags": value-or-None,
    "fields": dict-or-list, "limit": int-or-None}.
    """
    q = dict(query)
    limit = q.get(":limit")
    fields = q.get(":fields") or ()
    srctags = q.get(":srctags")
    tmin, tmax = q.get(":tmin"), q.get(":tmax")
    for k in _V1_CONTROL_KEYS:
        q.pop(k, None)
    if community_ids:
        q[community_field] = {"$in": list(community_ids)}
    lo, hi = parse_min_max_dates(tmin, tmax, now_ms)
    if lo is not None or hi is not None:
        rng: dict[str, Any] = {}
        if lo is not None:
            rng["$gte"] = objectid_bound(lo)
        if hi is not None:
            rng["$lte"] = objectid_bound(hi)
        q[id_field] = rng
    if soft_delete:
        q[index_field] = {"$ne": "?DEL?"}
    return {"q": q, "srctags": srctags, "fields": fields, "limit": limit}


def apply_v1_query_object(
    df: DataFrame,
    query: Mapping[str, Any],
    community_ids: Sequence[Any] | None = None,
    sources: DataFrame | None = None,
    source_key_field: str = "sourceKey",
    source_tags_field: str = "tags",
    source_key_out: str = "key",
    now_ms: int | None = None,
    **parse_kwargs: Any,
) -> DataFrame:
    """End-to-end V1 scan: parse the envelope, resolve ``:srctags``
    against the ``sources`` dimension (a broadcast semi-join on the source
    key — the reference resolves srcTags to a source list driver-side and
    restricts the doc query, InfiniteMongoSplitter semantics), then apply
    the Mongo query + projection + limit."""
    parsed = parse_v1_query_object(query, community_ids, now_ms, **parse_kwargs)
    out = df
    if parsed["srctags"] is not None:
        if sources is None:
            raise ValueError(":srctags requires a sources dimension")
        matching = sources.filter(
            _mongo_field_pred(sources.schema, source_tags_field, parsed["srctags"])
        ).select(F.col(source_key_out).alias("__src_key")).distinct()
        out = out.join(
            F.broadcast(matching),
            out[source_key_field] == F.col("__src_key"),
            "left_semi",
        )
    out = out.filter(compile_mongo_query(parsed["q"], df.schema))
    fields = parsed["fields"]
    if fields:
        if isinstance(fields, Mapping):  # V1 {f:1} include / {f:0} exclude
            incl = [f for f, v in fields.items() if v]
            excl = [f for f, v in fields.items() if not v]
            out = out.select(*incl) if incl else out.drop(*excl)
        else:
            out = out.select(*fields)
    if parsed["limit"] is not None:
        out = out.limit(int(parsed["limit"]))
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
