"""data_juicer_spark — a PySpark-native CDC/ingest analytics engine.

A brand-new engine with the query/data-processing capabilities of
datajuicer/data-juicer (reference at /root/reference, studied for
behavior only), re-expressed Spark-first:

- operators (Mapper / Filter / Deduplicator / Selector / Grouper /
  Aggregator) are *column-expression builders first*, Arrow-vectorized
  pandas UDFs second — never per-row Python;
- pipelines compile to ONE lazy DataFrame DAG so Catalyst optimizes the
  whole chain (predicate pushdown, projection collapse, WSCG, AQE);
- the CDC layer replays binlog-style change events (I/U/D keyed on
  (repo, path)) through the operator pipeline into a snapshot-committed
  lake table (Iceberg-style: atomic metadata pointer + epoch fence for
  exactly-once), with hot-key salting for skewed repos.
"""

from data_juicer_spark.session import get_spark  # noqa: F401
from data_juicer_spark.registry import OPERATORS, load_ops  # noqa: F401
from data_juicer_spark.pipeline import Pipeline  # noqa: F401

__version__ = "0.1.0"
