from aleph2_contrib_spark.plans.pipeline import (  # noqa: F401
    EnrichmentModule,
    PassthroughModule,
    Stage,
    Pipeline,
)
