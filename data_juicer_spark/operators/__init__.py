"""Operator library. Importing this package populates the OPERATORS
registry (like the reference's ops/__init__.py auto-registration)."""

from data_juicer_spark.operators.base import (  # noqa: F401
    Aggregator, Deduplicator, Filter, Grouper, Mapper, Operator, Selector,
    STATS_COL,
)
from data_juicer_spark.operators import (  # noqa: F401
    augment, dedup, download, filters, groupers, mappers, multimodal,
    selectors,
)
