"""bench_extra — phase-isolated measurement for the optimization round.

NOT the graded bench (bench.py is frozen): this file exists to answer
"where do the seconds go" per guide §1 — each heavy query is broken into
its internal phases, timed with the noop sink where a DataFrame exists,
and labeled via setJobDescription so Spark history is readable.

Usage:
    python bench_extra.py [phase ...]
Phases: pipeline, minhash, similarity, exact, hourly, cdc  (default all)

Env mirrors bench.py: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or (os.cpu_count() or 4)

RESULTS: dict[str, float] = {}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn):
    spark.sparkContext.setJobDescription(name)
    t0 = time.time()
    out = fn()
    dt = round(time.time() - t0, 3)
    RESULTS[name] = dt
    spark.sparkContext.setJobDescription(None)
    print(f"  {name}: {dt}s", flush=True)
    return out


def phase_pipeline(spark, docs):
    from data_juicer_spark.pipeline import Pipeline

    pipe = Pipeline([
        {"whitespace_normalization_mapper": {"text_key": "text"}},
        {"clean_links_mapper": {"text_key": "text"}},
        {"clean_email_mapper": {"text_key": "text"}},
        {"text_length_filter": {"min_len": 20, "max_len": 10**9, "text_key": "text"}},
        {"words_num_filter": {"min_num": 5, "max_num": 10**9, "text_key": "text"}},
        {"alphanumeric_filter": {"min_ratio": 0.25, "text_key": "text"}},
    ])
    # plan-build + optimize cost alone (no execution)
    t0 = time.time()
    df = pipe.apply(docs)
    RESULTS["pipeline/plan_build_py"] = round(time.time() - t0, 3)
    timed(spark, "pipeline/explain(optimizer)", lambda: df._jdf.queryExecution().executedPlan())
    timed(spark, "pipeline/cold_count", lambda: pipe.apply(docs).agg({"doc_id": "count"}).collect())
    timed(spark, "pipeline/warm_count", lambda: pipe.apply(docs).agg({"doc_id": "count"}).collect())
    timed(spark, "pipeline/warm_noop", lambda: noop(pipe.apply(docs)))


def phase_minhash(spark, docs):
    from data_juicer_spark.registry import OPERATORS
    import data_juicer_spark.operators  # noqa: F401
    from data_juicer_spark.operators.dedup import connected_components

    op = OPERATORS.get("document_minhash_deduplicator")(
        text_key="text", id_key="doc_id", num_permutations=128,
        jaccard_threshold=0.7)
    print(f"  (bands={op.num_bands} rows={op.num_rows})")
    # 1. signature UDF alone
    mh = op._minhash_udf()
    from pyspark.sql import functions as F
    sig = docs.select(F.col("doc_id").alias("__uid__"),
                      mh(F.col("text")).alias("__minhash__")) \
        .where(F.col("__minhash__").isNotNull())
    timed(spark, "minhash/signatures_noop", lambda: noop(sig))
    timed(spark, "minhash/signatures_noop_warm", lambda: noop(sig))
    # 2. edges (includes signatures again)
    edges = op.duplicate_pairs(docs, "doc_id")
    timed(spark, "minhash/edges_noop", lambda: noop(edges))
    # 3. CC alone (edges recomputed inside)
    edges2 = op.duplicate_pairs(docs, "doc_id")
    timed(spark, "minhash/cc", lambda: noop(connected_components(edges2)))
    # 4. full op
    timed(spark, "minhash/full", lambda: op.apply(docs).agg({"doc_id": "count"}).collect())
    timed(spark, "minhash/full_warm", lambda: op.apply(docs).agg({"doc_id": "count"}).collect())


def phase_similarity(spark):
    from pyspark.sql import functions as F
    from data_juicer_spark.functions.similarity import brute_force_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    q = emb.where(F.col("vec_id") < 8).selectExpr("vec_id as q_id", "embedding")
    corpus = emb.where(F.col("vec_id") >= 8)
    from data_juicer_spark.functions.similarity import cosine
    scored = corpus.crossJoin(F.broadcast(q.select(F.col("q_id"), F.col("embedding").alias("__qv__")))) \
        .select("q_id", "vec_id", F.round(cosine(F.col("__qv__"), F.col("embedding")), 6).alias("cos_sim"))
    timed(spark, "similarity/scored_noop", lambda: noop(scored))
    timed(spark, "similarity/scored_noop_warm", lambda: noop(scored))
    timed(spark, "similarity/full", lambda: brute_force_topk(
        q, corpus, k=10).agg({"q_id": "count"}).collect())
    timed(spark, "similarity/full_warm", lambda: brute_force_topk(
        q, corpus, k=10).agg({"q_id": "count"}).collect())


def phase_exact(spark, docs):
    from data_juicer_spark.registry import OPERATORS
    import data_juicer_spark.operators  # noqa: F401

    op = OPERATORS.get("document_deduplicator")(text_key="text", id_key="doc_id")
    timed(spark, "exact/full", lambda: op.apply(docs).agg({"doc_id": "count"}).collect())
    timed(spark, "exact/full_warm", lambda: op.apply(docs).agg({"doc_id": "count"}).collect())


def phase_hourly(spark):
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    agg = ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type") \
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("sv"))
    timed(spark, "hourly/full", lambda: agg.agg({"cnt": "sum"}).collect())
    timed(spark, "hourly/full_warm", lambda: agg.agg({"cnt": "sum"}).collect())


def phase_cdc(spark):
    from data_juicer_spark.cdc import CdcReplayer, generate_events
    from data_juicer_spark.lake import SnapshotTable
    from data_juicer_spark.pipeline import Pipeline

    CDC_EVENTS, CDC_EPOCHS = 400_000, 4
    root = tempfile.mkdtemp(prefix="benchx_lake_")
    try:
        events = generate_events(
            spark, CDC_EVENTS, batch_size=CDC_EVENTS // CDC_EPOCHS,
            n_repos=200, n_paths=2000).persist()
        timed(spark, "cdc/generate_persist_count", events.count)
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
        for ep in range(CDC_EPOCHS):
            from pyspark.sql import functions as F
            batch = events.where(F.col("epoch") == ep)
            timed(spark, f"cdc/epoch_{ep}", lambda b=batch, e=ep: rep.apply_epoch(b, e))
        snap = table.current_snapshot()
        if snap and snap.get("deltas"):
            timed(spark, "cdc/final_fold", lambda: table._compact(snap, epoch=snap["epoch"]))
        events.unpersist()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    want = set(sys.argv[1:]) or {"pipeline", "minhash", "similarity", "exact",
                                 "hourly", "cdc"}
    from data_juicer_spark import get_spark

    t0 = time.time()
    spark = get_spark(parallelism=CPUS, shuffle_partitions=max(CPUS, 16),
                      app_name="bench_extra")
    RESULTS["session_start"] = round(time.time() - t0, 3)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if "pipeline" in want:
        phase_pipeline(spark, docs)
    if "exact" in want:
        phase_exact(spark, docs)
    if "minhash" in want:
        phase_minhash(spark, docs)
    if "similarity" in want:
        phase_similarity(spark)
    if "hourly" in want:
        phase_hourly(spark)
    if "cdc" in want:
        phase_cdc(spark)
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
