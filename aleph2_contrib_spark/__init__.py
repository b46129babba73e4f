"""aleph2_contrib_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of IKANOW/Aleph2-contrib.

This is NOT a port: the reference (Java 8 plugin layer over Elasticsearch /
MongoDB / Hadoop / Storm) is re-expressed Spark-first. The logical surface
(query DSL, update DSL, enrichment pipelines, dedup/graph, time-partitioned
storage, streaming) is preserved; execution is delegated to Catalyst/Tungsten
via the DataFrame API.

Layers
------
- ``functions``  — query DSL (``Q``) → Column compiler, update DSL (``U``),
  scalar helpers. Reference: MongoDbUtils.java / ElasticsearchUtils.java.
- ``model``      — bucket / data-schema specs (DataBucketBean analogue).
- ``sources``    — table catalog, file-ingest (JSON/XML/binary), streams.
- ``plans``      — enrichment pipeline DAG compiler (EnrichmentPipelineService
  / RddDependencyUtils analogue) on mapInPandas / applyInPandas.
- ``operators``  — CRUD service, dedup (exact/minhash/simhash/incremental),
  similarity search, text analysis, graph build/merge, multimodal columns,
  and corpus preparation for LLM training data (deterministic
  sampling/mixing, contamination checks, sequence packing, repetition
  scoring, PII redaction, training-order shuffles, stratified sampling).
- ``streaming``  — Structured Streaming runner (same pipeline under
  foreachBatch).
"""

__version__ = "0.1.0"

from aleph2_contrib_spark.session import get_spark  # noqa: F401
