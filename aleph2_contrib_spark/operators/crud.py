"""CRUD service over a parquet-backed table — the Spark analogue of the
reference's per-backend ICrudService implementations
(ElasticsearchCrudService.java / MongoDbCrudService.java).

Read ops are lazy DataFrame expressions (Catalyst pushes predicates and
projections into the scan). Write ops are read-modify-write against the
table path; at 100 TB these map onto a transactional format's MERGE/DELETE
with partition pruning — the compiled expressions are identical, only the
commit protocol differs.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aleph2_contrib_spark.functions.query import (
    MultiQuery,
    SingleQuery,
    apply_query,
    compile_query,
)
from aleph2_contrib_spark.functions.update import (
    UpdateComponent,
    apply_update,
    delete_by_spec,
    upsert_by_spec,
)


class CrudService:
    """One instance per bucket/table. ``df`` is the current snapshot."""

    def __init__(self, spark: SparkSession, path: str | None = None, df: DataFrame | None = None):
        self.spark = spark
        self.path = path
        self._df = df

    # -- plumbing ----------------------------------------------------------
    @property
    def df(self) -> DataFrame:
        if self._df is None:
            self._df = self.spark.read.parquet(self.path)
        return self._df

    def _rewrite(self, new_df: DataFrame) -> None:
        """Atomic-ish table replace: write to a temp dir, swap directories.
        This is the parquet stand-in for the reference's secondary-buffer
        promote (ElasticsearchIndexService.java:495-545); a transactional
        format replaces it with a metadata commit."""
        if self.path is None:
            self._df = new_df
            return
        tmp = self.path + ".staging-" + uuid.uuid4().hex[:8]
        new_df.write.mode("overwrite").parquet(tmp)
        old = self.path + ".old-" + uuid.uuid4().hex[:8]
        shutil.move(self.path, old)
        shutil.move(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)
        self._df = None

    # -- read surface (C1-C3, C17-C18) ------------------------------------
    def get_object_by_id(self, oid: Any, id_field: str = "_id") -> dict | None:
        rows = self.df.filter(F.col(id_field) == F.lit(oid)).limit(1).collect()
        return rows[0].asDict(recursive=True) if rows else None

    def get_object_by_spec(self, spec) -> dict | None:
        rows = apply_query(self.df, spec).limit(1).collect()
        return rows[0].asDict(recursive=True) if rows else None

    def get_objects_by_spec(self, spec) -> DataFrame:
        return apply_query(self.df, spec)

    def count_objects(self, spec=None) -> int:
        if spec is None:
            return self.df.count()
        return self.df.filter(compile_query(spec, self.df.schema)).count()

    def get_meta_model(self) -> dict:
        """C19: JDBC/MetaModel-style table metadata (reference wraps the
        collection in an Apache MetaModel DataContext,
        MongoDbCrudService.java:692-735) — here the Spark schema is the
        catalog."""
        return {
            "table": self.path,
            "columns": [
                {"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
                for f in self.df.schema.fields
            ],
        }

    def get_raw_service(self) -> DataFrame:
        """C17: same table as untyped JSON strings."""
        return self.df.select(F.to_json(F.struct("*")).alias("json"))

    def get_filtered_repo(self, auth_spec) -> "CrudService":
        """C18: repo view pre-filtered by an authorization predicate."""
        return CrudService(self.spark, df=self.df.filter(compile_query(auth_spec, self.df.schema)))

    # -- physical layout hints (C16) ---------------------------------------
    def optimize_query(self, ordered_fields: Sequence[str]) -> None:
        """C16 optimizeQuery (reference: MongoDbCrudService.java:297-322
        creates a secondary index on the field list). Parquet has no
        secondary indexes; the scale-equivalent is clustering the file
        layout on those fields so min/max row-group stats become selective
        (the Z-ORDER/sort-order maintenance of table formats). Rewrites the
        table range-partitioned THEN sorted on the field list — without the
        repartitionByRange, equal key values stay scattered across every
        file and per-file min/max stats span the whole domain (no
        selectivity); a no-op for in-memory repos."""
        if self.path is None:
            return
        self._registered_indexes = getattr(self, "_registered_indexes", [])
        self._registered_indexes.append(tuple(ordered_fields))
        self._rewrite(
            self.df.repartitionByRange(*ordered_fields).sortWithinPartitions(*ordered_fields)
        )

    def deregister_optimized_query(self, ordered_fields: Sequence[str]) -> bool:
        """C16: drop a registered layout hint (data is left as-is — matching
        Mongo dropIndex semantics, which don't reshuffle documents)."""
        idx = getattr(self, "_registered_indexes", [])
        try:
            idx.remove(tuple(ordered_fields))
            return True
        except ValueError:
            return False

    # -- write surface (C4-C6, C13-C15) ------------------------------------
    def store_objects(self, new_df: DataFrame, replace_if_present: bool = False, id_field: str = "_id") -> None:
        if replace_if_present and id_field in self.df.columns:
            survivors = self.df.join(
                F.broadcast(new_df.select(id_field)), on=id_field, how="left_anti"
            )
            self._rewrite(survivors.unionByName(new_df, allowMissingColumns=True))
        elif self.path is not None:
            new_df.write.mode("append").parquet(self.path)
            self._df = None
        else:
            self._df = self.df.unionByName(new_df, allowMissingColumns=True)

    def update_objects_by_spec(self, spec, update: UpdateComponent) -> None:
        self._rewrite(apply_update(self.df, spec, update))

    def update_object_by_spec(self, spec, update: UpdateComponent, upsert: bool = False) -> None:
        if upsert:
            self._rewrite(upsert_by_spec(self.df, spec, update))
        else:
            self._rewrite(apply_update(self.df, spec, update))

    def delete_objects_by_spec(self, spec) -> None:
        self._rewrite(delete_by_spec(self.df, spec))

    def delete_object_by_id(self, oid: Any, id_field: str = "_id") -> None:
        self._rewrite(self.df.filter(F.col(id_field) != F.lit(oid)))

    def delete_datastore(self) -> None:
        if self.path and os.path.exists(self.path):
            shutil.rmtree(self.path)
        self._df = None
