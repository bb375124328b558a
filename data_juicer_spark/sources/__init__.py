from data_juicer_spark.sources.builder import DatasetBuilder, Exporter  # noqa: F401
