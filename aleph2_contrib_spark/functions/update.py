"""Update DSL → DataFrame transformation compiler.

The reference's ``UpdateComponent`` translates to Mongo update documents
($inc/$set/$unset/$push/$addToSet/$pull — reference MongoDbUtils.java:237-341)
applied server-side by spec. Spark has no in-place mutation, so the Spark-
native semantics are *read-modify-write*: rows matching the query spec get
the mutation expressions applied via ``CASE WHEN``; everything stays one
Catalyst projection (no shuffle, no Python).

At 100 TB the real deployment pairs this with a transactional table format
(Delta/Iceberg ``MERGE INTO``), where the same compiled expressions become
the ``WHEN MATCHED THEN UPDATE SET`` clauses and partition pruning limits
the rewrite to affected partitions. The compiler below is format-agnostic.

Operator coverage (SURVEY §2.2): C7 increment, C8 set/unset, C9 add,
C10 add_deduplicate, C11 remove (value / collection / sub-query),
C12 nested dotted paths, C13/C14 delete by spec, C6 upsert.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aleph2_contrib_spark.functions.query import (
    MultiQuery,
    SingleQuery,
    compile_query,
    _field_type,
    _norm_value,
)


@dataclass(frozen=True)
class UpdateClause:
    fld: str
    op: str  # set | unset | increment | add | add_dedup | remove
    args: tuple


@dataclass
class UpdateComponent:
    clauses: list[UpdateClause] = field(default_factory=list)

    def set(self, fld: str, value: Any):
        self.clauses.append(UpdateClause(fld, "set", (value,)))
        return self

    def unset(self, fld: str):
        self.clauses.append(UpdateClause(fld, "unset", ()))
        return self

    def increment(self, fld: str, delta: Any = 1):
        self.clauses.append(UpdateClause(fld, "increment", (delta,)))
        return self

    def add(self, fld: str, values: Any, deduplicate: bool = False):
        """List append ($push/$each); with deduplicate=True → set-add
        ($addToSet). A non-sequence value appends a single element."""
        vals = tuple(values) if isinstance(values, (list, tuple, set)) else (values,)
        self.clauses.append(
            UpdateClause(fld, "add_dedup" if deduplicate else "add", (vals,))
        )
        return self

    def remove(self, fld: str, values: Any):
        """Remove by value / collection ($pullAll) or by sub-query predicate
        ($pull with query): pass a SingleQuery built against the *element*
        (field name ignored; use "" convention) or a plain value/list."""
        self.clauses.append(UpdateClause(fld, "remove", (values,)))
        return self


class U:
    @staticmethod
    def update() -> UpdateComponent:
        return UpdateComponent()


# ---------------------------------------------------------------------------
# Compilation
# ---------------------------------------------------------------------------


def _array_lit(vals: Sequence[Any], elem_type: T.DataType | None) -> Column:
    cols = [F.lit(_norm_value(v)) for v in vals]
    arr = F.array(*cols)
    if elem_type is not None:
        arr = arr.cast(T.ArrayType(elem_type))
    return arr


def _mutate_expr(df_schema: T.StructType, clause: UpdateClause, cur: Column) -> Column:
    ftype = _field_type(df_schema, clause.fld)
    elem = ftype.elementType if isinstance(ftype, T.ArrayType) else None

    if clause.op == "set":
        v = clause.args[0]
        c = F.lit(_norm_value(v)) if not isinstance(v, Column) else v
        return c.cast(ftype) if ftype is not None and not isinstance(v, Column) else c
    if clause.op == "increment":
        # $inc on a missing/null field initializes it to the delta (Mongo).
        return F.coalesce(cur, F.lit(0).cast(ftype) if ftype else F.lit(0)) + F.lit(clause.args[0])
    if clause.op == "add":
        return F.concat(
            F.coalesce(cur, _array_lit((), elem)), _array_lit(clause.args[0], elem)
        )
    if clause.op == "add_dedup":
        return F.array_union(
            F.coalesce(cur, _array_lit((), elem)), _array_lit(clause.args[0], elem)
        )
    if clause.op == "remove":
        target = clause.args[0]
        if isinstance(target, (SingleQuery, MultiQuery)):
            # $pull with a sub-query: keep elements NOT matching. The
            # sub-query's field clauses address fields of the element
            # (struct arrays) or the element itself (fld == "").
            def elem_pred(x: Column) -> Column:
                return _compile_elem_query(target, x)

            return F.filter(cur, lambda x: ~elem_pred(x))
        vals = target if isinstance(target, (list, tuple, set)) else [target]
        return F.array_except(cur, _array_lit(list(vals), elem))
    raise ValueError(f"unknown update op: {clause.op}")


def _compile_elem_query(spec: SingleQuery | MultiQuery, x: Column) -> Column:
    """Compile a query spec against an array *element* column (for remove-by-
    sub-query). Field "" targets the element; other names target struct
    fields of the element."""
    from functools import reduce

    if isinstance(spec, MultiQuery):
        cols = [_compile_elem_query(c, x) for c in spec.components]
    else:
        def one(c):
            col = x if c.fld == "" else x.getField(c.fld)
            if c.op == "equals":
                return col == F.lit(_norm_value(c.args[0]))
            if c.op == "not_equals":
                return col != F.lit(_norm_value(c.args[0]))
            if c.op == "any_of":
                from functools import reduce as red

                return red(lambda a, b: a | b, (col == F.lit(_norm_value(v)) for v in c.args[0]))
            if c.op == "range":
                lo, lo_incl, hi, hi_incl = c.args
                preds = []
                if lo is not None:
                    preds.append(col >= F.lit(lo) if lo_incl else col > F.lit(lo))
                if hi is not None:
                    preds.append(col <= F.lit(hi) if hi_incl else col < F.lit(hi))
                from functools import reduce as red

                return red(lambda a, b: a & b, preds) if preds else F.lit(True)
            raise ValueError(f"unsupported element op {c.op}")

        cols = [one(c) for c in spec.clauses]
    combine = (lambda a, b: a & b) if spec.op == "and" else (lambda a, b: a | b)
    return reduce(combine, cols)


def _set_nested(df: DataFrame, path: str, value_expr: Callable[[Column], Column], pred: Column) -> DataFrame:
    """Apply ``value_expr`` at a dotted path, conditionally on ``pred``.
    Struct intermediates are updated with withField (reference nestedPut
    creates intermediates, MongoDbUtils.java:344-354)."""
    parts = path.split(".")
    if len(parts) == 1:
        cur = F.col(path) if path in df.columns else F.lit(None)
        new = value_expr(cur)
        if path in df.columns:
            new = F.when(pred, new).otherwise(F.col(path))
        else:
            new = F.when(pred, new)
        return df.withColumn(path, new)
    root = parts[0]
    root_type = _field_type(df.schema, root)
    if isinstance(root_type, T.MapType) and len(parts) == 2:
        # map-column path "m.key": set/mutate one entry via map_concat
        # (Mongo dotted-path updates into subdocuments stored as maps).
        key = parts[1]
        cur = F.col(root).getItem(key)
        entry = F.create_map(F.lit(key), value_expr(cur).cast(root_type.valueType))
        new_root = F.map_concat(
            F.map_filter(F.coalesce(F.col(root), F.create_map().cast(root_type)), lambda k, v: k != key),
            entry,
        )
        return df.withColumn(root, F.when(pred, new_root).otherwise(F.col(root)))
    new_leaf = value_expr(F.col(path))
    new_root = _with_field_path(F.col(root), parts[1:], new_leaf)
    return df.withColumn(root, F.when(pred, new_root).otherwise(F.col(root)))


def _with_field_path(root: Column, parts: list[str], leaf: Column) -> Column:
    if len(parts) == 1:
        return root.withField(parts[0], leaf)
    return root.withField(parts[0], _with_field_path(root.getField(parts[0]), parts[1:], leaf))


def _drop_nested(df: DataFrame, path: str, pred: Column) -> DataFrame:
    parts = path.split(".")
    if len(parts) == 1:
        # top-level unset → null out where matched (column stays, Mongo drops
        # the key; null is the columnar representation of absent)
        return df.withColumn(path, F.when(pred, F.lit(None).cast(df.schema[path].dataType)).otherwise(F.col(path)))
    root = parts[0]
    root_type = _field_type(df.schema, root)
    if isinstance(root_type, T.MapType) and len(parts) == 2:
        # unset on a map path removes the KEY (true Mongo $unset semantics —
        # maps, unlike structs, can drop entries).
        key = parts[1]
        dropped = F.map_filter(F.col(root), lambda k, v: k != key)
        return df.withColumn(root, F.when(pred, dropped).otherwise(F.col(root)))
    leaf_type = _field_type(df.schema, path)
    nulled = _with_field_path(F.col(root), parts[1:], F.lit(None).cast(leaf_type))
    return df.withColumn(root, F.when(pred, nulled).otherwise(F.col(root)))


def apply_update(
    df: DataFrame,
    spec: SingleQuery | MultiQuery,
    update: UpdateComponent,
) -> DataFrame:
    """updateObjectsBySpec: rows matching ``spec`` get ``update`` applied;
    all other rows pass through unchanged. One narrow projection — no
    shuffle (reference MongoDbCrudService.java:484-563)."""
    # Materialize the predicate FIRST so later mutations of its input
    # columns cannot change which rows count as matched (all clauses see
    # the pre-update row, like a server-side update document).
    out = df.withColumn("__matched", compile_query(spec, df.schema))
    pred = F.col("__matched")
    for clause in update.clauses:
        if clause.op == "unset":
            out = _drop_nested(out, clause.fld, pred)
        else:
            out = _set_nested(
                out, clause.fld, lambda cur, c=clause: _mutate_expr(df.schema, c, cur), pred
            )
    return out.drop("__matched")


def delete_by_spec(df: DataFrame, spec: SingleQuery | MultiQuery) -> DataFrame:
    """deleteObjectsBySpec → anti-filter (reference
    ElasticsearchCrudService.java:1016-1143). With a transactional format
    this compiles to ``DELETE WHERE`` touching only matching partitions.

    NULL-safe: a row whose predicate evaluates to NULL (NULL field in an
    equality/range term) is NOT matched by the delete query and must
    survive — a bare ``~pred`` would silently drop it under three-valued
    logic."""
    return df.filter(~F.coalesce(compile_query(spec, df.schema), F.lit(False)))


def upsert_by_spec(
    df: DataFrame,
    spec: SingleQuery | MultiQuery,
    update: UpdateComponent,
    insert_row: dict[str, Any] | None = None,
) -> DataFrame:
    """updateObjectBySpec(upsert=True): if any row matches, update matched
    rows; otherwise append one row built from the spec's equality terms plus
    set-clauses (Mongo upsert seeding semantics)."""
    pred = compile_query(spec, df.schema)
    matched = df.filter(pred).limit(1).count() > 0
    if matched:
        return apply_update(df, spec, update)
    aligned = seed_row_df(df.sparkSession, df.schema, spec, update, insert_row)
    return df.unionByName(aligned)


def seed_row_df(
    spark,
    schema: T.StructType,
    spec: SingleQuery | MultiQuery,
    update: UpdateComponent,
    insert_row: dict[str, Any] | None = None,
) -> DataFrame:
    """The single seeded row a no-match upsert inserts: the spec's equality
    terms + the update's set/increment/add clauses (Mongo upsert seeding),
    aligned to ``schema``. Built JVM-side (range(1) + literals): a
    createDataFrame([dict]) row scans an ExistingRDD of Python objects,
    which re-launches a Python worker on EVERY downstream action —
    seconds of overhead for one row. Literals cost nothing."""
    seed: dict[str, Any] = dict(insert_row or {})
    if isinstance(spec, SingleQuery):
        for c in spec.clauses:
            if c.op == "equals":
                seed.setdefault(c.fld, c.args[0])
    for c in update.clauses:
        if c.op == "set":
            seed[c.fld] = c.args[0]
        elif c.op == "increment":
            seed[c.fld] = c.args[0]
        elif c.op in ("add", "add_dedup"):
            seed[c.fld] = list(c.args[0])

    def lit_of(v):
        if isinstance(v, (list, tuple)):
            return F.array(*[F.lit(x) for x in v])
        return F.lit(v)

    return spark.range(1).select(
        *[
            (lit_of(seed[f.name]) if f.name in seed else F.lit(None)).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
    )
