"""Analyzer — the dj-analyze mirror (/root/reference/data_juicer/core/
analyzer.py:25-177): run only the stats phase of every Filter, then
summarize each stat column (count/mean/stddev/min/quartiles/max) and
per-category frequencies.

Spark-native: stats land in one nested struct column from a single
pass (Filters' stats_exprs, no keep/drop applied — analyzer.py:121-127
skips process()); the summary is one `summary()`/approxQuantile scan.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_juicer_spark.operators.base import Filter, STATS_COL
from data_juicer_spark.registry import load_ops


class Analyzer:
    def __init__(self, process: List[dict]):
        self.ops = [op for op in load_ops(process) if isinstance(op, Filter)]

    def compute_stats(self, df: DataFrame) -> DataFrame:
        """Apply every Filter's stats phase (no filtering).

        Consecutive word filters on the same text column share ONE
        refined-words array, built inside a single nested HOF lambda
        (same mechanism as Pipeline's filter fusion): computing each
        word stat from its own refined chain re-evaluates the split +
        strip per stat — measured 6x slower on a 3-word-stat analyzer
        pass at sf0.1. Field order and values match the sequential
        merge exactly (existing fields kept first, new stats appended
        in op order)."""
        run: list = []
        for op in self.ops:
            if type(op).stats_exprs is getattr(Filter, "stats_exprs"):
                continue  # non-stats filter (suffix/field) — nothing to add
            if self._words_capable(op) and (
                    not run or op.text_key == run[0].text_key):
                run.append(op)
                continue
            df = self._flush_word_run(df, run)
            run = []
            if self._words_capable(op):
                run.append(op)
            else:
                df = op.compute_stats(df)
        return self._flush_word_run(df, run)

    @staticmethod
    def _words_capable(op) -> bool:
        fn = getattr(op, "stat_expr_on_refined", None)
        if fn is None or not getattr(op, "stat_key", ""):
            return False
        try:
            return fn(F.array().cast("array<string>")) is not None
        except Exception:
            return False

    @staticmethod
    def _flush_word_run(df: DataFrame, run: list) -> DataFrame:
        if not run:
            return df
        if len(run) == 1:
            return run[0].compute_stats(df)
        from data_juicer_spark.functions.text import refined_words

        tkey = run[0].text_key
        has_stats = STATS_COL in df.columns
        new_keys = [op.stat_key for op in run]
        keep = ([f for f in df.schema[STATS_COL].dataType.fieldNames()
                 if f not in new_keys] if has_stats else [])
        st_in = (F.col(STATS_COL) if has_stats
                 else F.struct(F.lit(0).alias("__none__")))
        # bind (text, existing stats) first, then the shared refined
        # array — every upstream expression is evaluated exactly once
        src = F.struct(F.col(tkey).alias("t"), st_in.alias("st"))

        def outer(s):
            def inner(ws):
                fields = [s["st"][f].alias(f) for f in keep]
                fields += [op.stat_expr_on_refined(ws).alias(op.stat_key)
                           for op in run]
                return F.struct(*fields)

            return F.element_at(
                F.transform(F.array(refined_words(s["t"])), inner), 1)

        bound = F.element_at(F.transform(F.array(src), outer), 1)
        return df.withColumn(STATS_COL, bound)

    def overall(self, df: DataFrame,
                percentiles: Optional[List[float]] = None) -> DataFrame:
        """OverallAnalysis mirror: describe() + percentiles per stat.
        Returns a tidy DataFrame (stat, count, mean, stddev, min, p25,
        p50, p75, max)."""
        pct = percentiles or [0.25, 0.5, 0.75]
        stats_df = self.compute_stats(df)
        if STATS_COL not in stats_df.columns:
            raise ValueError("no stats computed — no stats-bearing filters")
        numeric = [
            f.name
            for f in stats_df.schema[STATS_COL].dataType.fields
            if f.dataType.typeName() in
            ("double", "float", "long", "integer", "short")
        ]
        flat = stats_df.select(
            *[F.col(f"{STATS_COL}.{c}").cast("double").alias(c) for c in numeric]
        ).persist()
        try:
            aggs = []
            for c in numeric:
                aggs += [
                    F.count(c).alias(f"{c}__count"),
                    F.round(F.avg(c), 6).alias(f"{c}__mean"),
                    F.round(F.stddev_samp(c), 6).alias(f"{c}__stddev"),
                    F.min(c).alias(f"{c}__min"),
                    F.max(c).alias(f"{c}__max"),
                ]
            row = flat.agg(*aggs).collect()[0]
            quants = {
                c: flat.approxQuantile(c, pct, 0.001) for c in numeric
            }
            out = []
            for c in numeric:
                rec = {
                    "stat": c,
                    "count": row[f"{c}__count"],
                    "mean": row[f"{c}__mean"],
                    "stddev": row[f"{c}__stddev"],
                    "min": row[f"{c}__min"],
                    "max": row[f"{c}__max"],
                }
                for p, v in zip(pct, quants[c]):
                    rec[f"p{int(p * 100)}"] = v
                out.append(rec)
            spark = df.sparkSession
            return spark.createDataFrame(out)
        finally:
            flat.unpersist()

    def _numeric_stats(self, stats_df: DataFrame) -> List[str]:
        return [
            f.name
            for f in stats_df.schema[STATS_COL].dataType.fields
            if f.dataType.typeName() in
            ("double", "float", "long", "integer", "short")
        ]

    def correlation(self, df: DataFrame,
                    stats: Optional[List[str]] = None) -> DataFrame:
        """CorrelationAnalysis mirror (reference analysis/
        correlation_analysis.py): pairwise Pearson correlation of the
        numeric stat columns, computed in ONE distributed agg pass
        (k*(k-1)/2 F.corr aggregates — no per-pair scans). Returns a
        tidy (stat_a, stat_b, corr) frame."""
        stats_df = self.compute_stats(df)
        spark_ = df.sparkSession
        cols = stats or (
            self._numeric_stats(stats_df)
            if STATS_COL in stats_df.columns else [])
        pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
        if not pairs:  # <2 numeric stats → empty result, not a crash
            return spark_.createDataFrame(
                [], "stat_a string, stat_b string, corr double")
        flat = stats_df.select(
            *[F.col(f"{STATS_COL}.{c}").cast("double").alias(c) for c in cols])
        row = flat.agg(*[
            F.round(F.corr(a, b), 6).alias(f"{a}|{b}") for a, b in pairs
        ]).collect()[0]
        spark = df.sparkSession
        return spark.createDataFrame(
            [(a, b, row[f"{a}|{b}"]) for a, b in pairs],
            "stat_a string, stat_b string, corr double")

    def insight_mining(self, before: DataFrame, after: DataFrame,
                       stats: Optional[List[str]] = None,
                       threshold: float = 1.96) -> DataFrame:
        """Per-op distribution-shift insight (reference core/adapter.py
        insight mining + analysis/measure.py:64-115's t-test): Welch's t
        statistic per stat from one agg pass per side (n, mean, var) —
        no scipy; `significant` flags |t| above the given normal-approx
        critical value (1.96 ≈ two-sided 5%, documented deviation: no
        exact p-value tables)."""
        sb, sa = self.compute_stats(before), self.compute_stats(after)
        cols = stats or [
            c for c in self._numeric_stats(sb)
            if c in set(self._numeric_stats(sa))
        ]

        def moments(sdf):
            flat = sdf.select(*[
                F.col(f"{STATS_COL}.{c}").cast("double").alias(c) for c in cols])
            aggs = []
            for c in cols:
                aggs += [F.count(c).alias(f"{c}__n"),
                         F.avg(c).alias(f"{c}__m"),
                         F.var_samp(c).alias(f"{c}__v")]
            return flat.agg(*aggs).collect()[0]

        rb, ra = moments(sb), moments(sa)
        out = []
        for c in cols:
            nb, mb, vb = rb[f"{c}__n"], rb[f"{c}__m"], rb[f"{c}__v"]
            na, ma, va = ra[f"{c}__n"], ra[f"{c}__m"], ra[f"{c}__v"]
            if not nb or not na or vb is None or va is None:
                t = None
                sig = False
            else:
                denom = (vb / nb + va / na) ** 0.5
                if denom > 0:
                    t = (ma - mb) / denom
                elif ma != mb:
                    # both sides constant but at DIFFERENT values: the
                    # strongest possible shift, not "no shift"
                    t = float("inf") if ma > mb else float("-inf")
                else:
                    t = 0.0
                sig = abs(t) > threshold
            out.append((c, int(nb or 0), float(mb) if mb is not None else None,
                        int(na or 0), float(ma) if ma is not None else None,
                        round(t, 4) if t is not None else None, bool(sig)))
        spark = before.sparkSession
        return spark.createDataFrame(
            out, "stat string, n_before long, mean_before double, "
                 "n_after long, mean_after double, welch_t double, "
                 "significant boolean")

    def column_wise_hist(self, df: DataFrame, stat: str, bins: int = 20):
        """ColumnWiseAnalysis-style histogram for one stat (list of
        (bin_start, count)), computed distributed via width_bucket."""
        stats_df = self.compute_stats(df)
        col = F.col(f"{STATS_COL}.{stat}").cast("double")
        mn, mx = stats_df.agg(F.min(col), F.max(col)).collect()[0]
        if mn is None or mn == mx:
            return [(mn, stats_df.count())]
        width = (mx - mn) / bins
        hist = (
            stats_df.select(
                F.least(
                    F.floor((col - F.lit(mn)) / F.lit(width)), F.lit(bins - 1)
                ).alias("bin")
            )
            .groupBy("bin").count().orderBy("bin").collect()
        )
        return [(mn + r["bin"] * width, r["count"]) for r in hist]
