from data_juicer_spark.functions import text, hashing, similarity  # noqa: F401
