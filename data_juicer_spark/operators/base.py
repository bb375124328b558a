"""Operator base classes — the six operator kinds of the reference
(/root/reference/data_juicer/ops/base_op.py:313-750) re-expressed as lazy
DataFrame transforms.

Design: an op NEVER materializes. ``apply(df)`` adds columns / filters /
reshapes the lazy plan; a pipeline of N ops is ONE Catalyst-optimized DAG
(the reference materializes an Arrow cache per op — we deliberately don't).

Filter contract (mirrors base_op.py:407-540 two-phase design):
  - ``stats_exprs(df) -> dict[stat_name, Column]``: vectorized stat
    expressions (Catalyst exprs preferred; pandas UDF when genuinely
    needed). Stats land in a nested ``stats`` struct column so the
    Analyzer can aggregate them and filters can be fused naturally.
  - ``keep_expr(df) -> Column[bool]``: the keep decision over stats,
    equivalent to get_keep_boolean min<=v<=max (base_op.py:476-484).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STATS_COL = "stats"  # our __dj__stats__ (constant.py:18), typed struct


def merge_stats(df: DataFrame, new_stats: Dict[str, Column]) -> DataFrame:
    """Merge stat columns into the nested ``stats`` struct (add-only
    schema evolution, mirroring base_op.py:275-295's stats injection)."""
    if not new_stats:
        return df
    if STATS_COL in df.columns:
        existing = df.schema[STATS_COL].dataType.fieldNames()
        fields = [
            F.col(f"{STATS_COL}.{f}").alias(f)
            for f in existing
            if f not in new_stats
        ]
    else:
        fields = []
    fields += [c.alias(k) for k, c in new_stats.items()]
    return df.withColumn(STATS_COL, F.struct(*fields))


class Operator:
    _op_name = "operator"
    text_key = "text"

    def __init__(self, text_key: str = "text", **kwargs):
        self.text_key = text_key
        self.params = kwargs

    @property
    def name(self) -> str:
        return self._op_name

    def apply(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def __repr__(self):
        return f"{type(self).__name__}({self.params})"


class Mapper(Operator):
    """Row→row text rewrite. Subclasses implement ``expr(col) -> Column``
    (Catalyst expression) or override ``apply`` for row-expanding maps.
    """

    def expr(self, col: Column) -> Column:
        raise NotImplementedError

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.text_key, self.expr(F.col(self.text_key)))


class Filter(Operator):
    """Two-phase filter: compute stats, then keep by range.

    Every range filter honors the reference's filter-strategy kwargs
    (base_op.py:427-443, get_keep_boolean :477-484):
    ``min_closed_interval`` / ``max_closed_interval`` (default True)
    and ``reversed_range`` (keep OUTSIDE the range; flips the interval
    closedness at construction, like the reference)."""

    # closed-interval keep bounds, as in base_op.py:427-443
    min_val: Optional[float] = None
    max_val: Optional[float] = None

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.min_closed_interval = bool(
            self.params.get("min_closed_interval", True))
        self.max_closed_interval = bool(
            self.params.get("max_closed_interval", True))
        self.reversed_range = bool(self.params.get("reversed_range", False))
        if self.reversed_range:
            self.min_closed_interval = not self.min_closed_interval
            self.max_closed_interval = not self.max_closed_interval

    def stats_exprs(self, df: DataFrame) -> Dict[str, Column]:
        raise NotImplementedError

    def keep_expr(self, df: DataFrame) -> Column:
        raise NotImplementedError

    def keep_between(self, col: Column, lo, hi) -> Column:
        """min<=v<=max keep decision (get_keep_boolean, base_op.py:476-484),
        with interval-closedness and reversed_range strategies."""
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (col >= F.lit(lo)
                           if self.min_closed_interval else col > F.lit(lo))
        if hi is not None:
            cond = cond & (col <= F.lit(hi)
                           if self.max_closed_interval else col < F.lit(hi))
        if self.reversed_range:
            cond = ~cond
        return cond

    def compute_stats(self, df: DataFrame) -> DataFrame:
        """Merge this op's stats into the nested ``stats`` struct column."""
        return merge_stats(df, self.stats_exprs(df))

    def apply(self, df: DataFrame) -> DataFrame:
        return self.compute_stats(df).filter(self.keep_expr(df))


class Deduplicator(Operator):
    """Dataset-level dedup: compute a grouping key, keep first per group
    (first = min order key, deterministic under shuffle)."""

    def apply(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def cap_stats(self) -> dict:
        """Visibility for candidate-size caps (no-silent-caps principle):
        reports {'dropped_groups': n, 'largest_group': m} — the number of
        candidate groups (LSH buckets / simhash blocks / shingle keys)
        the op's size cap excluded from pair generation, and the largest
        group seen. Opt-in diagnostic: executes one aggregate job over
        the candidate-count plan built by the last apply()."""
        plan = getattr(self, "_cap_plan", None)
        if plan is None:
            raise RuntimeError(
                "no capped candidate stage built — run apply() first "
                "(only simhash/ngram/embedding dedups have caps)")
        return plan.first().asDict()


class Selector(Operator):
    """Global dataset→dataset selection (top-k / range / frequency / random)."""


class Grouper(Operator):
    """Rows → batched rows (group into lists)."""


class Aggregator(Operator):
    """Batched rows → summarized rows (applyInPandas-shaped)."""
