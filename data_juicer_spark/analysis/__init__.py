from data_juicer_spark.analysis.analyzer import Analyzer  # noqa: F401
from data_juicer_spark.analysis.tracer import Tracer  # noqa: F401
