"""Pipeline — compiles a Data-Juicer-style YAML/dict recipe into ONE lazy
DataFrame transform chain.

The reference executes a sequential for-loop over ops, materializing an
Arrow cache per op (/root/reference/data_juicer/core/data/dj_dataset.py:
254-349). We instead fold all ops into a single DAG so Catalyst sees the
whole plan: native-expr filters get pushed ahead of Python stages
automatically, adjacent projections collapse, and the job runs as a few
whole-stage-codegen'd stages instead of N materialized passes.

Operator-level stats (kept/dropped counts — the Analyzer/Tracer mirror,
core/monitor.py, core/tracer.py) are collected with `observe()` named
metrics, which ride the same action instead of forcing extra passes.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

from data_juicer_spark.registry import load_ops


class _FusedFilterRun:
    """A maximal run of consecutive Catalyst-pure range filters over the
    same text column, fused into ONE exists()-lambda predicate.

    Why: Catalyst substitutes filter predicates through projections
    unconditionally, so N sequential filters downstream of a regexp
    mapper chain re-inline the whole chain into every stat reference
    (~2N+2 evaluations per row); FilterExec does not common-subexpression
    -eliminate across conjuncts. Binding the text column to a
    higher-order-function lambda variable is a substitution barrier the
    optimizer respects, so the chain is evaluated exactly once per row
    for the entire run (plan-gated in tests/test_plans.py; measured 4x
    on the bench cleaning pipeline at sf0.1). Mirrors the intent of the
    reference's INTER_WORDS op fusion (core/optimizer/op_fusion.py:14-28)
    — share the expensive tokenization across fused ops — expressed as
    a Catalyst rewrite instead of a fused Python loop.

    Output contract is identical to applying the run sequentially: same
    surviving rows (stats are pure per-row functions, conjunction ==
    chained filters) and same stats-struct schema (each op's stat merged
    in op order; Catalyst prunes the struct when nothing consumes it).
    """

    def __init__(self, ops):
        self.ops = ops
        self.text_key = ops[0].text_key
        self.name = "fused(" + "+".join(op.name for op in ops) + ")"
        # the fused predicate/stats Columns are input-independent
        # (built from unresolved F.col refs) but EXPENSIVE to build —
        # hundreds of py4j round-trips for the nested HOF lambdas
        # (~0.3-0.5 s per construction). Build once, reuse per apply.
        self._keep_col = None
        self._stats_exprs = None

    def _keep(self):
        """Fused predicate via layered nested-HOF binding, innermost to
        outermost: text -> shared refined-words array -> shared lines
        array -> a struct of every op's STAT VALUE -> the conjunction of
        range checks over the bound stats.

        Each binding level exists so the interpreted HOF predicate
        evaluates every expensive expression exactly once per row:
        - the text binding stops Catalyst re-inlining an upstream
          mapper chain per reference (plan-gated: one chain copy);
        - the refined/lines bindings stop each word/line filter from
          re-splitting the text per stat (re-deriving refined words
          per op measured 11x slower at sf0.1);
        - the stat-value binding stops keep_between from evaluating a
          stat twice when both bounds are set (its (e>=lo)&(e<=hi)
          references e twice).
        Bindings are only added when an op in the run needs them."""
        from data_juicer_spark.functions.text import lines, refined_words

        tcol = F.col(self.text_key)
        sprobe = F.array().cast("array<string>")
        kinds = []
        for op in self.ops:
            kind = "text"
            if getattr(op, "stat_expr_on_refined", None) is not None \
                    and op.stat_expr_on_refined(sprobe) is not None:
                kind = "refined"
            elif getattr(op, "stat_expr_on_lines", None) is not None \
                    and op.stat_expr_on_lines(F.lit(""), sprobe) is not None:
                kind = "lines"
            kinds.append(kind)
        need_ws = "refined" in kinds
        need_ls = "lines" in kinds

        def bound_struct(t):
            fields = [t.alias("t")]
            if need_ws:
                fields.append(refined_words(t).alias("ws"))
            if need_ls:
                fields.append(lines(t).alias("ls"))
            return F.struct(*fields)

        def cond(s):
            c = None
            for op, kind in zip(self.ops, kinds):
                if kind == "refined":
                    e = op.stat_expr_on_refined(s["ws"])
                elif kind == "lines":
                    e = op.stat_expr_on_lines(s["t"], s["ls"])
                else:
                    e = op.stat_expr_on(s["t"])
                k = op.keep_between(e, op.min_val, op.max_val)
                c = k if c is None else (c & k)
            return c

        # conjunct short-circuiting is kept deliberately: binding the
        # stat VALUES instead (a second struct layer) avoids
        # keep_between's double reference but computes every stat for
        # every row — measured a net loss on word-filter runs where an
        # early cheap condition prunes most evaluation
        return F.exists(
            F.transform(F.array(tcol), lambda t: bound_struct(t)), cond)

    def _all_stats(self, df):
        if self._stats_exprs is None:
            exprs = {}
            for op in self.ops:
                exprs.update(op.stats_exprs(df))
            self._stats_exprs = exprs
        return self._stats_exprs

    def _keep_cached(self):
        if self._keep_col is None:
            self._keep_col = self._keep()
        return self._keep_col

    def apply(self, df: DataFrame) -> DataFrame:
        from data_juicer_spark.operators.base import merge_stats

        return merge_stats(df.filter(self._keep_cached()), self._all_stats(df))

    # flag-mode surface (Pipeline CDC path): stats for ALL rows, keep
    # decision AND-ed into the flag column instead of dropping
    def compute_stats(self, df: DataFrame) -> DataFrame:
        from data_juicer_spark.operators.base import merge_stats

        return merge_stats(df, self._all_stats(df))

    def keep_expr(self, df: DataFrame):
        return self._keep_cached()


def _fusable(op) -> bool:
    keep_on = getattr(op, "keep_on", None)
    if keep_on is None:
        return False
    try:
        return keep_on(F.col(op.text_key)) is not None
    except Exception:
        return False


class Pipeline:
    def __init__(self, process: List[dict], observe: bool = False,
                 text_key: Optional[str] = None):
        """process: list of {op_name: kwargs} dicts (the reference's IR,
        config.py:867+). observe=True attaches per-op row observers.
        text_key: recipe-global text column (the reference's top-level
        `text_keys`, config.py) applied to every op that doesn't set
        its own."""
        if text_key:
            process = [
                {name: dict({"text_key": text_key}, **(kw or {}))}
                for entry in process
                for name, kw in entry.items()
            ]
        self.ops = load_ops(process)
        self.observe = observe
        self.observations: dict[str, Observation] = {}
        # fuse once at construction: the fused runs cache their (large)
        # predicate Columns across apply() calls — a replay loop applying
        # the same pipeline per micro-batch pays the py4j expression
        # build once, not per epoch
        self._fused_ops = None if observe else self._fuse_filter_runs(self.ops)

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.apply(df)

    def apply(self, df: DataFrame, filter_mode: str = "drop",
              flag_col: str = "__keep__") -> DataFrame:
        """filter_mode='drop': Filters remove rows (default).
        filter_mode='flag': Filters AND their keep decision into
        `flag_col` instead of dropping — the CDC replay path uses this
        so 'kept rows' and 'rows demoted to deletes' come out of ONE
        lineage with no anti-join (one shuffle less per micro-batch)."""
        from data_juicer_spark.operators.base import (
            Aggregator, Deduplicator, Filter, Grouper, Selector,
        )

        self.observations = {}
        if filter_mode == "flag":
            df = df.withColumn(flag_col, F.lit(True))
        else:
            # batch pipelines read files: fan a single-row-group/tiny
            # scan out to all cores before the per-row op chain (no-op
            # at scale and for already-shuffled inputs; the flag-mode
            # CDC path feeds compacted batches, already partitioned)
            from data_juicer_spark.functions.partitioning import (
                ensure_scan_parallelism,
            )

            df = ensure_scan_parallelism(df)
        ops = self._fused_ops if not self.observe else self.ops
        for i, op in enumerate(ops):
            if self.observe:
                obs = Observation(f"{i:02d}_{op.name}_in")
                df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
                self.observations[f"{i:02d}_{op.name}_in"] = obs
            if filter_mode == "flag" and isinstance(op, _FusedFilterRun):
                df = op.compute_stats(df)
                df = df.withColumn(flag_col,
                                   F.col(flag_col) & op.keep_expr(df))
            elif filter_mode == "flag" and isinstance(op, Filter) \
                    and type(op).keep_expr is not Filter.keep_expr:
                df = op.compute_stats(df)
                df = df.withColumn(flag_col, F.col(flag_col) & op.keep_expr(df))
            elif filter_mode == "flag" and isinstance(
                    op, (Filter, Deduplicator, Selector, Grouper, Aggregator)):
                # an op that drops OR reshapes rows in flag mode would
                # silently swallow rows (incl. op='D' delete events)
                # instead of demoting them to lake deletes — refuse
                # loudly rather than corrupt CDC state (replayer
                # invariant: every input key surfaces kept-or-deleted)
                raise ValueError(
                    f"operator '{op.name}' cannot run in filter_mode="
                    f"'flag': it drops rows via apply() and does not "
                    f"express a keep_expr. Use filter_mode='drop' or "
                    f"exclude it from the CDC replay pipeline."
                )
            else:
                df = op.apply(df)
        if self.observe and self.ops:
            obs = Observation("zz_out")
            df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
            self.observations["zz_out"] = obs
        return df

    def op_stats(self) -> dict[str, int]:
        """Row counts seen at each op boundary (valid after an action)."""
        return {k: v.get["rows"] for k, v in self.observations.items()}

    @staticmethod
    def _fuse_filter_runs(ops):
        """Replace maximal runs of >=2 consecutive fusable filters
        (Catalyst-pure stat, same text column) with one
        _FusedFilterRun; everything else passes through in order."""
        out, run = [], []

        def flush():
            if len(run) >= 2:
                out.append(_FusedFilterRun(list(run)))
            else:
                out.extend(run)
            run.clear()

        for op in ops:
            if _fusable(op) and (not run or op.text_key == run[0].text_key):
                run.append(op)
            else:
                flush()
                if _fusable(op):
                    run.append(op)
                else:
                    out.append(op)
        flush()
        return out


def from_yaml(path_or_str: str, observe: bool = False) -> Pipeline:
    """Load a recipe from YAML: top-level `process:` list plus the
    reference's global `text_keys` (string or single-element list),
    same layout as the reference's config files (configs/*.yaml)."""
    import yaml

    try:
        with open(path_or_str) as f:
            cfg = yaml.safe_load(f)
    except (OSError, FileNotFoundError):
        cfg = yaml.safe_load(path_or_str)
    text_keys = cfg.get("text_keys")
    if isinstance(text_keys, list):
        if len(text_keys) != 1:
            raise ValueError(
                "multi-column text_keys recipes are not supported — "
                "give each op an explicit text_key instead")
        text_keys = text_keys[0]
    return Pipeline(cfg["process"], observe=observe, text_key=text_keys)
