from data_juicer_spark.streaming.stream_replay import StreamingReplayer  # noqa: F401
