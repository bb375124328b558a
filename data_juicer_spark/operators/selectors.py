"""Selectors — global dataset→dataset selection.

Reference cites into /root/reference/data_juicer/ops/selector/. All are
pure Catalyst plans (orderBy/limit, window ranks, group top-k semi-join,
seeded sample) — no Python in the path.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_juicer_spark.operators.base import Selector
from data_juicer_spark.registry import OPERATORS


def _resolve(field_key: str):
    """'stats.text_len'-style nested keys resolve naturally via F.col."""
    return F.col(field_key)


def _numeric_sort_key(df: DataFrame, field_key: str, reverse: bool):
    """The reference's stats_to_number contract
    (utils/common_utils.py:11-26): strings parse as floats, lists take
    their mean, and None / unparseable / empty collapse to ∓maxsize so
    they always sort LAST in the chosen direction. Expressed as one
    Catalyst column: cast-to-double (null on failure) / array mean,
    then coalesce to ±Infinity."""
    from pyspark.sql import types as T

    col = _resolve(field_key)
    dt = df.select(col).schema[0].dataType
    if isinstance(dt, T.ArrayType):
        vals = F.transform(col, lambda x: x.try_cast("double"))
        key = F.when(
            F.size(col) > 0,
            F.aggregate(vals, F.lit(0.0), lambda a, x: a + x)
            / F.size(col))
    else:
        # try_cast: unparseable strings become null (ANSI-safe), which
        # the sentinel then sends to the end — stats_to_number parity
        key = col.try_cast("double")
    sentinel = float("-inf") if reverse else float("inf")
    return F.coalesce(key, F.lit(sentinel))


@OPERATORS.register("topk_specified_field_selector")
class TopkSpecifiedFieldSelector(Selector):
    """top-k (or top-ratio) rows by a (nested) field
    (topk_specified_field_selector.py:55-94). Deterministic tiebreak on
    id_key so results are stable under shuffle."""

    def __init__(self, field_key: str = "", topk: Optional[int] = None,
                 top_ratio: Optional[float] = None, reverse: bool = True,
                 id_key: Optional[str] = None, **kw):
        super().__init__(**kw)
        self.field_key = field_key
        self.topk = topk
        self.top_ratio = top_ratio
        self.reverse = reverse  # True = descending (largest first)
        self.id_key = id_key

    def apply(self, df: DataFrame) -> DataFrame:
        if not self.field_key:
            return df  # reference early-return contract
        if not self.top_ratio and not self.topk:
            return df  # nothing to select by (falsy checks, like the
            #            reference — ratio 0.0 counts as unset)
        col = _numeric_sort_key(df, self.field_key, self.reverse)
        if self.topk is not None and not self.top_ratio:
            order = [col.desc() if self.reverse else col.asc()]
            if self.id_key:
                order.append(F.col(self.id_key).asc())
            # global top-k: Spark's orderBy+limit compiles to
            # TakeOrderedAndProject (per-partition heap + driver merge —
            # no full sort shuffle).
            return df.orderBy(*order).limit(self.topk)
        # top_ratio path: k depends on n, but a df.count() here would be a
        # second full scan just to size the limit. Instead rank rows with
        # the exact distributed prefix sum over DISTINCT values (same
        # machinery as RangeSpecifiedFieldSelector); its only action is
        # the #partitions-row totals collect, and n falls out of it.
        from pyspark.sql import Window

        from data_juicer_spark.functions.ranks import exclusive_prefix_sum

        cnts = df.groupBy(col.alias("__v__")).agg(
            F.count(F.lit(1)).alias("__w__"))
        cum, n = exclusive_prefix_sum(cnts, "__v__", "__w__", out="__below__")
        if n <= 1:
            return df  # reference early-return contract
        # reference semantics (topk_specified_field_selector.py:66-75):
        # select_num = ratio*n, reduced to topk when topk is smaller;
        # int-truncated (0 rows for a tiny ratio is faithful)
        k = int(n * self.top_ratio)
        if self.topk is not None:
            k = min(k, self.topk)
        if self.reverse:
            # rows above in DESC order = n - (rows below in ASC) - ties;
            # the ∓inf sentinel group lands last in either direction
            cum = cum.withColumn(
                "__above__", F.lit(n) - F.col("__below__") - F.col("__w__"))
        else:
            cum = cum.withColumn("__above__", F.col("__below__"))
        j = df.join(cum.select("__v__", "__above__"),
                    col.eqNullSafe(F.col("__v__")), "left")
        tie_order = F.col(self.id_key).asc() if self.id_key else col.asc()
        w = Window.partitionBy("__v__").orderBy(tie_order)
        return (
            j.withColumn("__pos__", F.row_number().over(w) - 1)
            .where(F.col("__above__") + F.col("__pos__") < F.lit(k))
            .drop("__v__", "__above__", "__pos__")
        )


@OPERATORS.register("frequency_specified_field_selector")
class FrequencySpecifiedFieldSelector(Selector):
    """keep rows whose field value is among the top-k most frequent
    (frequency_specified_field_selector.py:52-93)."""

    def __init__(self, field_key: str = "", topk: Optional[int] = None,
                 top_ratio: Optional[float] = None, reverse: bool = True,
                 id_key: Optional[str] = None, **kw):
        super().__init__(**kw)
        self.field_key = field_key
        self.topk = topk
        self.top_ratio = top_ratio
        self.reverse = reverse  # True = most frequent first (reference)
        self.id_key = id_key

    def apply(self, df: DataFrame) -> DataFrame:
        if not self.field_key:
            return df  # reference early-return contract
        if not self.top_ratio and not self.topk:
            # nothing to select by → unchanged (falsy, like the
            # reference: ratio 0.0 counts as unset) — and no wasted
            # groupBy/semi-join work
            return df
        col = _resolve(self.field_key)
        # reference breaks count ties by FIRST APPEARANCE (stable sort
        # over insertion order) — id_key reproduces that; without one,
        # ties break on the value itself (deterministic under shuffle)
        tie = (F.min(self.id_key) if self.id_key
               else F.min(F.lit(0))).alias("__first__")
        freq = df.groupBy(col.alias("__fv__")).agg(
            F.count(F.lit(1)).alias("count"), tie)
        if self.top_ratio:
            # reference: ratio of DISTINCT value groups, reduced to
            # topk when smaller (frequency_...selector.py:79-88); the
            # count() runs on the tiny distinct table, not the dataset
            n = freq.count()
            k = int(n * self.top_ratio)
            if self.topk is not None:
                k = min(k, self.topk)
        else:
            k = self.topk
        order = F.col("count").desc() if self.reverse else F.col("count").asc()
        top = freq.orderBy(order, F.col("__first__").asc(),
                           F.col("__fv__").asc()).limit(k)
        # broadcast semi-join: top-k value set is tiny by construction;
        # null-safe so a null value group selected into the top-k keeps
        # its rows (None is a legal group in the reference)
        return df.join(
            F.broadcast(top.select("__fv__")), col.eqNullSafe(F.col("__fv__")),
            "left_semi"
        )


@OPERATORS.register("range_specified_field_selector")
class RangeSpecifiedFieldSelector(Selector):
    """keep the RANK window of the ascending-sorted field — the
    reference's exact semantics (range_specified_field_selector.py:
    71-117): bounds are int-truncated rank positions,
    lower = max(int(lower_percentile·n), lower_rank) and
    upper = min(int(upper_percentile·n), upper_rank), clamped to
    lower ≤ upper; field values go through stats_to_number (floats,
    list means, None/unparseable → -maxsize ranking first). Ties are
    ordered by id_key (the reference's heapq stability keys on dataset
    order), and a tie group crossing the LOWER bound keeps its
    earliest members, mirroring the reference's stable nlargest pass.

    Distributed shape: rank(row) = (#rows with smaller value, via the
    exact distributed prefix sum over the DISTINCT-value table —
    functions/ranks.py) + (tie position from a window PARTITIONED by
    the value) — no stage funnels the dataset through one task.
    """

    def __init__(self, field_key: str = "",
                 lower_percentile: Optional[float] = None,
                 upper_percentile: Optional[float] = None,
                 lower_rank: Optional[int] = None,
                 upper_rank: Optional[int] = None,
                 id_key: Optional[str] = None, **kw):
        super().__init__(**kw)
        self.field_key = field_key
        self.lo_pct, self.hi_pct = lower_percentile, upper_percentile
        self.lo_rank, self.hi_rank = lower_rank, upper_rank
        self.id_key = id_key

    def apply(self, df: DataFrame) -> DataFrame:
        from data_juicer_spark.functions.ranks import exclusive_prefix_sum

        if not self.field_key:
            return df
        if self.lo_pct is None and self.lo_rank is None:
            return df  # reference early-return contract
        if self.hi_pct is None and self.hi_rank is None:
            return df

        col = _numeric_sort_key(df, self.field_key, reverse=True)
        cnts = df.groupBy(col.alias("__v__")).agg(F.count(F.lit(1)).alias("__w__"))
        cum, n = exclusive_prefix_sum(cnts, "__v__", "__w__", out="__below__")
        if n <= 1:
            return df  # reference early-return contract

        k_lo, k_hi = 0, n
        if self.lo_pct is not None:
            k_lo = int(self.lo_pct * n)
        if self.lo_rank is not None:
            k_lo = max(k_lo, self.lo_rank)
        if self.hi_pct is not None:
            k_hi = int(self.hi_pct * n)
        if self.hi_rank is not None:
            k_hi = min(k_hi, self.hi_rank)
        k_hi = max(k_lo, k_hi)

        # null-SAFE equi-join: the sentinel makes __v__ non-null, but
        # eqNullSafe keeps the join robust to a future key change
        joined = df.join(cum.select("__v__", "__below__", "__w__"),
                         col.eqNullSafe(F.col("__v__")))
        order_col = self.id_key or df.columns[0]
        w = Window.partitionBy("__v__").orderBy(F.col(order_col).asc())
        p = F.row_number().over(w) - 1          # tie position
        g0 = F.col("__below__")
        # group size inside the nsmallest(k_hi) subset
        gs = F.greatest(F.lit(0),
                        F.least(g0 + F.col("__w__"), F.lit(k_hi)) - g0)
        pc = F.col("__p__")
        keep = ((g0 + pc < F.lit(k_hi))         # inside the subset
                # a tie group crossing k_lo keeps its EARLIEST members
                # (stable-nlargest parity): p slots = g0 + gs - k_lo
                & (pc < g0 + gs - F.lit(k_lo)))
        return (joined.withColumn("__p__", p).where(keep)
                .drop("__v__", "__below__", "__w__", "__p__"))


@OPERATORS.register("random_selector")
class RandomSelector(Selector):
    """uniform sample by ratio or count (random_selector.py:23-60),
    seeded for determinism. Reference contract: EXACT sample counts
    (int(ratio·n), reduced to select_num when both are set and it is
    smaller); neither set (or ratio 0.0, falsy like the reference) →
    dataset unchanged; n ≤ 1 unchanged.

    Distributed shape: selection = the k smallest rows under a seeded
    md5 hex digest of the full row (a pure function of content + seed,
    so stable under shuffle/recompute — F.rand is not), ranked with the
    same exact prefix-sum machinery as the other selectors. No global
    TakeOrdered merge, no extra count() scan — k≈n stays fully
    distributed. md5 rather than xxhash64 because BOTH Spark and DuckDB
    compute it natively and identically on string-castable columns,
    which makes the sample engine-portable and therefore
    oracle-checkable (round-3 VERDICT item 2). The row key is
    md5(concat(per-column md5 ‖ seed)) — each column hashed SEPARATELY
    to fixed-width hex with a distinct null sentinel, so NULL columns
    and separator bytes inside values cannot shift field boundaries and
    collapse distinct rows (a plain concat_ws would: it silently skips
    NULLs). Non-scalar columns degrade to Spark's string rendering
    (still deterministic, just not oracle-portable)."""

    def __init__(self, select_ratio: Optional[float] = None,
                 select_num: Optional[int] = None, seed: int = 42, **kw):
        super().__init__(**kw)
        self.ratio = select_ratio
        self.num = select_num
        self.seed = seed

    def apply(self, df: DataFrame) -> DataFrame:
        if not self.ratio and self.num is None:
            return df  # reference early-return contract
        from pyspark.sql import Window

        from data_juicer_spark.functions.ranks import exclusive_prefix_sum

        key = F.md5(F.concat(
            *[F.coalesce(F.md5(F.col(c).cast("string")), F.lit("~null~"))
              for c in df.columns],
            F.lit(str(self.seed))))
        cnts = df.groupBy(key.alias("__v__")).agg(
            F.count(F.lit(1)).alias("__w__"))
        cum, n = exclusive_prefix_sum(cnts, "__v__", "__w__",
                                      out="__below__")
        if n <= 1:
            return df  # reference early-return contract
        if not self.ratio:
            k = self.num
        else:
            k = int(self.ratio * n)
            if self.num is not None:
                k = min(k, self.num)
        j = df.join(cum.select("__v__", "__below__"),
                    key.eqNullSafe(F.col("__v__")), "left")
        # identical rows share a hash; any tie order yields an
        # equivalent sample, so a constant-order row_number is fine
        w = Window.partitionBy("__v__").orderBy(F.lit(0))
        return (j.withColumn("__pos__", F.row_number().over(w) - 1)
                .where(F.col("__below__") + F.col("__pos__") < F.lit(k))
                .drop("__v__", "__below__", "__pos__"))


@OPERATORS.register("tags_specified_field_selector")
class TagsSpecifiedFieldSelector(Selector):
    """keep rows whose field ∈ tag set (tags_specified_field_selector.py)."""

    def __init__(self, field_key: str = "", target_tags=(), **kw):
        super().__init__(**kw)
        self.field_key = field_key
        self.tags = list(target_tags)

    def apply(self, df: DataFrame) -> DataFrame:
        if not self.field_key:
            return df  # reference early-return contract
        return df.filter(_resolve(self.field_key).isin(self.tags))
