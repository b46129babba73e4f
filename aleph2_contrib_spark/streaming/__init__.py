from aleph2_contrib_spark.streaming.runner import StreamingPipelineRunner, kafka_stream, json_file_stream  # noqa: F401
