"""Dump .explain("formatted") for the bench queries (and key operator
sub-plans) into plans/r06/<query>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> [query ...]
  tag: 'before' or 'after' (file suffix)
  queries default: all.

cdc_replay is a loop of write jobs, not one plan; we capture the two
load-bearing sub-plans: the per-epoch merged batch (compact+pipeline →
merge_combined input) and the MOR resolution read that the final
compaction folds (the two plans the epoch time is made of).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or (os.cpu_count() or 4)
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", "r06")


def fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def dump(name: str, tag: str, df) -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(fmt(df))
    print(f"wrote {path}")


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    want = set(sys.argv[2:]) or None

    from pyspark.sql import functions as F
    from data_juicer_spark import get_spark
    from data_juicer_spark.pipeline import Pipeline
    from data_juicer_spark.registry import OPERATORS
    import data_juicer_spark.operators  # noqa: F401

    spark = get_spark(parallelism=CPUS, shuffle_partitions=max(CPUS, 16),
                      app_name="dump_plans")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def w(name):
        return want is None or name in want

    if w("pipeline_clean_filter"):
        pipe = Pipeline([
            {"whitespace_normalization_mapper": {"text_key": "text"}},
            {"clean_links_mapper": {"text_key": "text"}},
            {"clean_email_mapper": {"text_key": "text"}},
            {"text_length_filter": {"min_len": 20, "max_len": 10**9, "text_key": "text"}},
            {"words_num_filter": {"min_num": 5, "max_num": 10**9, "text_key": "text"}},
            {"alphanumeric_filter": {"min_ratio": 0.25, "text_key": "text"}},
        ])
        dump("pipeline_clean_filter", tag,
             pipe.apply(docs).agg({"doc_id": "count"}))

    if w("dedup_exact"):
        op = OPERATORS.get("document_deduplicator")(text_key="text", id_key="doc_id")
        dump("dedup_exact", tag, op.apply(docs).agg({"doc_id": "count"}))

    if w("dedup_minhash"):
        op = OPERATORS.get("document_minhash_deduplicator")(
            text_key="text", id_key="doc_id", num_permutations=128,
            jaccard_threshold=0.7)
        # the edge plan is the expensive pre-CC part (CC is iterative jobs)
        dump("dedup_minhash_edges", tag, op.duplicate_pairs(docs, "doc_id"))

    if w("similarity_topk"):
        from data_juicer_spark.functions.similarity import brute_force_topk
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
        q = emb.where(F.col("vec_id") < 8).selectExpr("vec_id as q_id", "embedding")
        dump("similarity_topk", tag,
             brute_force_topk(q, emb.where(F.col("vec_id") >= 8), k=10)
             .agg({"q_id": "count"}))

    if w("events_hourly"):
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        dump("events_hourly", tag,
             ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
             .agg(F.count("*").alias("cnt"), F.sum("value").alias("sv"))
             .agg({"cnt": "sum"}))

    if w("cdc_replay"):
        from data_juicer_spark.cdc import CdcReplayer, generate_events
        from data_juicer_spark.lake import SnapshotTable
        root = tempfile.mkdtemp(prefix="plans_lake_")
        try:
            events = generate_events(spark, 40_000, batch_size=10_000,
                                     n_repos=200, n_paths=2000)
            pipe = Pipeline([
                {"clean_copyright_mapper": {"text_key": "content"}},
                {"clean_email_mapper": {"text_key": "content"}},
                {"clean_links_mapper": {"text_key": "content"}},
                {"text_length_filter": {"min_len": 20, "max_len": 10**9,
                                        "text_key": "content"}},
            ])
            table = SnapshotTable(spark, root, ["repo", "path"], num_buckets=64,
                                  strategy="mor", compact_every=8)
            rep = CdcReplayer(table, pipeline=pipe)
            batch1 = events.where(F.col("epoch") == 1)
            # the per-epoch pre-write plan: compact + pipeline(flag)
            last = rep.compact(batch1)
            flagged = rep.pipeline.apply(last, filter_mode="flag")
            dump("cdc_epoch_batch", tag, flagged)
            # commit two epochs, then capture the MOR resolution read
            rep.apply_epoch(batch1, 1)
            rep.apply_epoch(events.where(F.col("epoch") == 2), 2)
            snap = table.current_snapshot()
            dump("cdc_mor_read", tag, table.read())
        finally:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
