from aleph2_contrib_spark.model.bucket import (  # noqa: F401
    Bucket,
    ColumnarSchema,
    TemporalSchema,
    WriteSettings,
)
