"""Backend-agnostic CRUD query DSL → Catalyst ``Column`` compiler.

The reference defines a generic ``QueryComponent`` DSL translated twice —
to MongoDB (reference MongoDbUtils.java:67-222) and to Elasticsearch filters
(reference ElasticsearchUtils.java:81-305). This module is the third,
Spark-native translation: the DSL tree compiles to a single
``pyspark.sql.Column`` predicate plus (projection, order-by, limit) meta,
applied as ``df.filter(...).select(...).orderBy(...).limit(...)``.

Catalyst then does everything the reference hand-implements: predicate
pushdown into the parquet scan (≈ es.query pushdown,
ElasticsearchHadoopUtils.java:121-130), projection pushdown
(≈ setFetchSource, ElasticsearchCrudService.java:640-645), and partition
pruning (≈ interpretObviousDateRange, ElasticsearchUtils.java:261-305).

Operator coverage (SURVEY §2.1): Q1 equals / not-equals, Q2 any_of,
Q3 all_of, Q4 exists, Q5-Q8 range open/closed combinations, Q9 AND/OR term
composition, Q10 nested boolean trees, Q11 repeated clauses on one field,
Q12/Q13 _id/_type as ordinary columns, Q14 enum normalization, Q15 limit,
Q16 orderBy, Q17 projection, Q18 date-range extraction (partition pruning).

At 100 TB: the compiled predicate is pure Catalyst — it rides whole-stage
codegen, reaches the parquet reader as PushedFilters, and prunes
time-partitioned tables via the partition column. No Python executes per row.
"""

from __future__ import annotations

import datetime as _dt
import enum
from dataclasses import dataclass, field
from functools import reduce
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# DSL tree
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FieldClause:
    """One (field, operator, args) term. Repeating a field is allowed and
    means conjunction of the repeated clauses (reference keeps a
    LinkedHashMultimap of field → ops, MongoDbUtils.java:196-221)."""

    fld: str
    op: str  # equals | not_equals | any_of | all_of | exists | range
    args: tuple


@dataclass
class QueryBase:
    limit_: int | None = None
    order_by_: tuple[tuple[str, int], ...] = ()
    include_: tuple[str, ...] = ()
    exclude_: tuple[str, ...] = ()

    # -- meta (Q15-Q17) ----------------------------------------------------
    def limit(self, n: int):
        self.limit_ = n
        return self

    def order_by(self, *fields: tuple[str, int] | str):
        """orderBy((field, ±1), ...); bare string means ascending
        (reference MongoDbUtils.java:82-90)."""
        norm = tuple((f, 1) if isinstance(f, str) else (f[0], int(f[1])) for f in fields)
        self.order_by_ = self.order_by_ + norm
        return self

    def with_projection(self, include: Sequence[str] = (), exclude: Sequence[str] = ()):
        self.include_ = tuple(include)
        self.exclude_ = tuple(exclude)
        return self


@dataclass
class SingleQuery(QueryBase):
    """Conjunction (op='and') or disjunction (op='or') of field clauses —
    the reference's SingleQueryComponent (MongoDbUtils.java:145-150)."""

    op: str = "and"
    clauses: list[FieldClause] = field(default_factory=list)

    # -- term builders (Q1-Q8) --------------------------------------------
    def when(self, fld: str, value: Any):
        self.clauses.append(FieldClause(fld, "equals", (value,)))
        return self

    def when_not(self, fld: str, value: Any):
        """equals with a not-value — the reference's 2nd-arg-means-negation
        quirk (MongoDbUtils.java:111-112, ElasticsearchUtils.java:148-153)."""
        self.clauses.append(FieldClause(fld, "not_equals", (value,)))
        return self

    def with_any_of(self, fld: str, values: Sequence[Any]):
        self.clauses.append(FieldClause(fld, "any_of", (tuple(values),)))
        return self

    def with_all_of(self, fld: str, values: Sequence[Any]):
        self.clauses.append(FieldClause(fld, "all_of", (tuple(values),)))
        return self

    def with_present(self, fld: str):
        self.clauses.append(FieldClause(fld, "exists", (True,)))
        return self

    def with_not_present(self, fld: str):
        self.clauses.append(FieldClause(fld, "exists", (False,)))
        return self

    def range_open_open(self, fld: str, lo: Any = None, hi: Any = None):
        return self._range(fld, lo, False, hi, False)

    def range_open_closed(self, fld: str, lo: Any = None, hi: Any = None):
        return self._range(fld, lo, False, hi, True)

    def range_closed_closed(self, fld: str, lo: Any = None, hi: Any = None):
        return self._range(fld, lo, True, hi, True)

    def range_closed_open(self, fld: str, lo: Any = None, hi: Any = None):
        return self._range(fld, lo, True, hi, False)

    def text_match(self, fld: str, query: str, operator: str = "and"):
        """Tokenized full-text match (ES `match` analogue): every (operator=
        "and") or any (operator="or") whitespace token of ``query`` appears
        among the lowercased tokens of the field. The reference reaches
        tokenized search via ES analyzed fields (SURVEY §1.2); here it is an
        explicit operator over the raw stored value."""
        self.clauses.append(FieldClause(fld, "text_match", (query, operator)))
        return self

    def range_above(self, fld: str, lo: Any, inclusive: bool = True):
        return self._range(fld, lo, inclusive, None, False)

    def range_below(self, fld: str, hi: Any, inclusive: bool = False):
        return self._range(fld, None, False, hi, inclusive)

    def _range(self, fld: str, lo, lo_incl, hi, hi_incl):
        self.clauses.append(FieldClause(fld, "range", (lo, lo_incl, hi, hi_incl)))
        return self


@dataclass
class MultiQuery(QueryBase):
    """Arbitrary and/or nesting of query components — the reference's
    MultiQueryComponent (MongoDbUtils.java:157-177,
    ElasticsearchUtils.java:216-232)."""

    op: str = "and"
    components: list = field(default_factory=list)  # SingleQuery | MultiQuery

    def also(self, *qs):
        self.components.extend(qs)
        return self


class Q:
    """Entry points mirroring the reference's CrudUtils factory."""

    @staticmethod
    def all_of(*components) -> SingleQuery | MultiQuery:
        if components:
            return MultiQuery(op="and", components=list(components))
        return SingleQuery(op="and")

    @staticmethod
    def any_of(*components) -> SingleQuery | MultiQuery:
        if components:
            return MultiQuery(op="or", components=list(components))
        return SingleQuery(op="or")


# ---------------------------------------------------------------------------
# Compiler
# ---------------------------------------------------------------------------


def _norm_value(v: Any) -> Any:
    """Q14 enum normalization: enums are stringified before comparison
    (reference MongoDbUtils.removeEnums:183-188)."""
    if isinstance(v, enum.Enum):
        return v.name
    return v


def _field_type(schema: T.StructType | None, path: str) -> T.DataType | None:
    """Resolve the data type at a (possibly dotted) path, descending structs."""
    if schema is None:
        return None
    cur: T.DataType = schema
    for part in path.split("."):
        if isinstance(cur, T.StructType):
            try:
                cur = cur[part].dataType
            except KeyError:
                return None
        elif isinstance(cur, T.MapType):
            cur = cur.valueType
        else:
            return None
    return cur


def _resolve(schema: T.StructType | None, path: str) -> Column:
    """Path → Column. Dotted paths descend structs natively; a dotted path
    whose root is a MapType uses getItem (F.col("m.k") cannot address maps).
    Mirrors the reference's JsonUtils.getProperty dot-notation semantics."""
    parts = path.split(".")
    if schema is None or len(parts) == 1:
        return F.col(path)
    col = F.col(parts[0])
    cur = _field_type(schema, parts[0])
    for part in parts[1:]:
        if isinstance(cur, T.MapType):
            col = col.getItem(part)
            cur = cur.valueType
        else:
            col = col.getField(part) if isinstance(cur, T.StructType) else col.getItem(part)
            cur = _field_type_child(cur, part)
    return col


def _field_type_child(dt: T.DataType | None, name: str) -> T.DataType | None:
    if isinstance(dt, T.StructType):
        try:
            return dt[name].dataType
        except KeyError:
            return None
    if isinstance(dt, T.MapType):
        return dt.valueType
    return None


def _lit(v: Any) -> Column:
    v = _norm_value(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return F.lit(v)
    return F.lit(v)


def _clause_to_column(c: FieldClause, schema: T.StructType | None) -> Column:
    col = _resolve(schema, c.fld)
    ftype = _field_type(schema, c.fld)
    is_array = isinstance(ftype, T.ArrayType)

    if c.op == "equals":
        if is_array and not isinstance(c.args[0], (list, tuple)):
            # equality against an array field matches ELEMENTS (Mongo
            # {field: scalar} / ES term-on-array semantics)
            return F.array_contains(col, _norm_value(c.args[0]))
        return col == _lit(c.args[0])
    if c.op == "not_equals":
        # Mongo $ne also matches missing fields; ES mustNot(term) likewise.
        if is_array and not isinstance(c.args[0], (list, tuple)):
            return col.isNull() | ~F.array_contains(col, _norm_value(c.args[0]))
        return col.isNull() | (col != _lit(c.args[0]))
    if c.op == "any_of":
        vals = [_norm_value(v) for v in c.args[0]]
        if is_array:
            # any element of the array field ∈ set (ES terms on array field)
            return F.arrays_overlap(col, F.array(*[F.lit(v) for v in vals]))
        return col.isin(vals)
    if c.op == "all_of":
        vals = [_norm_value(v) for v in c.args[0]]
        if is_array:
            # array field ⊇ set (Mongo $all / ES terms-and)
            return reduce(
                lambda a, b: a & b, (F.array_contains(col, v) for v in vals)
            )
        # Mongo $all on a scalar matches iff the scalar equals every value
        # (SURVEY §7.3 risk item — tested both ways).
        return reduce(lambda a, b: a & b, (col == _lit(v) for v in vals))
    if c.op == "exists":
        return col.isNotNull() if c.args[0] else col.isNull()
    if c.op == "text_match":
        query, operator = c.args
        toks = F.split(F.lower(col), r"\s+")
        preds = [F.array_contains(toks, t) for t in str(query).lower().split()]
        if not preds:
            return F.lit(True)
        combine = (lambda a, b: a & b) if operator == "and" else (lambda a, b: a | b)
        return reduce(combine, preds)
    if c.op == "range":
        lo, lo_incl, hi, hi_incl = c.args
        preds = []
        if lo is not None:
            preds.append(col >= _lit(lo) if lo_incl else col > _lit(lo))
        if hi is not None:
            preds.append(col <= _lit(hi) if hi_incl else col < _lit(hi))
        if not preds:
            return F.lit(True)
        return reduce(lambda a, b: a & b, preds)
    raise ValueError(f"unknown clause op: {c.op}")


def compile_query(spec: SingleQuery | MultiQuery, schema: T.StructType | None = None) -> Column:
    """Compile the predicate part of a query component to one Column.

    Schema-aware (array vs scalar `all_of`, map vs struct dotted paths) when
    a schema is supplied; falls back to scalar semantics otherwise.
    """
    if isinstance(spec, SingleQuery):
        if not spec.clauses:
            return F.lit(True)
        cols = [_clause_to_column(c, schema) for c in spec.clauses]
    else:
        if not spec.components:
            return F.lit(True)
        cols = [compile_query(c, schema) for c in spec.components]
    combine = (lambda a, b: a & b) if spec.op == "and" else (lambda a, b: a | b)
    return reduce(combine, cols)


def apply_query(df: DataFrame, spec: SingleQuery | MultiQuery) -> DataFrame:
    """Full query application: filter + projection + orderBy + limit —
    the Spark analogue of getObjectsBySpec (reference
    ElasticsearchCrudService.java:742-804 / MongoDbCrudService.java:408-448).
    """
    out = df.filter(compile_query(spec, df.schema))
    if spec.include_:
        out = out.select(*[_resolve(df.schema, f).alias(f.replace(".", "_")) if "." in f else F.col(f) for f in spec.include_])
    elif spec.exclude_:
        out = out.drop(*spec.exclude_)
    if spec.order_by_:
        out = out.orderBy(*[F.col(f).asc() if d >= 0 else F.col(f).desc() for f, d in spec.order_by_])
    if spec.limit_ is not None:
        out = out.limit(spec.limit_)
    return out


# ---------------------------------------------------------------------------
# Q18: obvious-date-range extraction → partition predicate injection
# ---------------------------------------------------------------------------


def extract_date_range(
    spec: SingleQuery | MultiQuery, time_field: str
) -> tuple[Any | None, Any | None]:
    """Derive a [lo, hi] restriction on ``time_field`` from the query, if one
    is *obviously* implied (top-level AND context only — same conservatism as
    the reference's interpretObviousDateRange, ElasticsearchUtils.java:261-305).

    Used to inject a redundant predicate on a derived partition column
    (e.g. ``time_bucket``) so Catalyst prunes time partitions even when the
    raw predicate is on the un-partitioned event-time column.
    """
    lo: Any | None = None
    hi: Any | None = None

    def visit(node, and_context: bool):
        nonlocal lo, hi
        if isinstance(node, MultiQuery):
            if node.op != "and":
                return  # can't narrow through OR
            for c in node.components:
                visit(c, and_context)
            return
        if node.op != "and":
            return
        for c in node.clauses:
            if c.fld != time_field:
                continue
            if c.op == "equals":
                lo = c.args[0] if lo is None else max(lo, c.args[0])
                hi = c.args[0] if hi is None else min(hi, c.args[0])
            elif c.op == "range":
                c_lo, _, c_hi, _ = c.args
                if c_lo is not None:
                    lo = c_lo if lo is None else max(lo, c_lo)
                if c_hi is not None:
                    hi = c_hi if hi is None else min(hi, c_hi)

    visit(spec, True)
    return lo, hi


def inject_partition_predicate(
    df: DataFrame,
    spec: SingleQuery | MultiQuery,
    time_field: str,
    partition_col: str,
    truncate: str = "day",
) -> DataFrame:
    """Add ``partition_col`` bounds derived from the query's ``time_field``
    bounds so the scan prunes partitions (the Spark-native replacement for
    index-list narrowing, reference ElasticsearchContext.java:518-527)."""
    lo, hi = extract_date_range(spec, time_field)
    out = df
    if lo is not None:
        out = out.filter(F.col(partition_col) >= F.date_trunc(truncate, F.lit(lo)))
    if hi is not None:
        out = out.filter(F.col(partition_col) <= F.date_trunc(truncate, F.lit(hi)))
    return out
