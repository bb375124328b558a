from data_juicer_spark.lake.table import SnapshotTable  # noqa: F401
