"""Scale-step evidence (sf0.1 -> sf1, a measured 10x) for the north
rule's 10^10-event target: run the two heaviest engine paths — the CDC
replay loop and MinHash-LSH dedup — at 10x the per-round bench scale on
one box and report wall time + throughput next to the sf0.1 numbers.

What "passes": near-linear wall-time growth (<= ~10x on 10x input; the
paths are O(n) maps + O(n log n) shuffles) and no driver-memory creep —
every stage stays distributed (no collect of data rows anywhere).

Inputs are synthesized deterministically (no external data):
  - CDC: generate_events at 4,000,000 events (10x the bench's 400k),
    same epoch structure (4 epochs) and key skew.
  - Dedup: the sf0.1 documents table replicated 10x with a per-copy
    token appended to ~half the texts (deterministic via doc_id
    parity), so copies are near-dups — the adversarial case for
    MinHash banding (real extra candidate pairs, not trivially equal
    hashes) — while the other half are exact replicas.

Usage: python tools/bench_scale_step.py   (append output to BASELINE.md)
Env: SCALE_STEP_EVENTS (default 4_000_000), SCALE_STEP_DOC_COPIES (10).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTS = int(os.environ.get("SCALE_STEP_EVENTS", 4_000_000))
EPOCHS = int(os.environ.get("SCALE_STEP_EPOCHS", 4))
# COPIES=0 skips the dedup section (events-axis-only reruns)
COPIES = int(os.environ.get("SCALE_STEP_DOC_COPIES", 10))
# key-cardinality knobs: the flat-wall result at the defaults rides a
# bounded 200x2000 key space (compaction shuffle O(keys)); raising
# these makes keys ~ events — the adversarial case where shuffle rows
# grow with input — to show the degradation is the graceful O(events
# log events) one, not a cliff
REPOS = int(os.environ.get("SCALE_STEP_REPOS", 200))
PATHS = int(os.environ.get("SCALE_STEP_PATHS", 2000))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or (os.cpu_count() or 4)


def loadavg1() -> float:
    return os.getloadavg()[0]


def main() -> None:
    from pyspark.sql import functions as F

    from data_juicer_spark import get_spark
    from data_juicer_spark.cdc import CdcReplayer, generate_events
    from data_juicer_spark.lake import SnapshotTable
    from data_juicer_spark.pipeline import Pipeline
    from data_juicer_spark.registry import OPERATORS
    import data_juicer_spark.operators  # noqa: F401

    # local[N,3] + speculation: at tens of millions of generated rows a
    # Python worker occasionally wedges on its output socket (observed
    # ~1-in-3 runs at >=16M events: 31/32 generation tasks finish, one
    # straggler hangs forever). Local mode defaults to maxFailures=1 /
    # no speculation, so one zombie aborts the whole run — the exact
    # failure a real cluster absorbs with retries + speculative copies.
    spark = get_spark(parallelism=CPUS, shuffle_partitions=max(CPUS, 16),
                      app_name="scale-step", master=f"local[{CPUS},3]",
                      extra_conf={
                          "spark.speculation": "true",
                          "spark.speculation.multiplier": "3",
                          "spark.speculation.quantile": "0.9",
                      })
    out: dict = {"events": EVENTS, "epochs": EPOCHS,
                 "doc_copies": COPIES, "cpus": CPUS,
                 "n_repos": REPOS, "n_paths": PATHS,
                 "load_1min_at_start": round(loadavg1(), 2)}

    # ---- dedup_minhash at 10x docs --------------------------------
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = docs.count()
    copies = None
    for i in range(COPIES if COPIES > 0 else 0):
        # near-dup mutation on odd doc_ids: append a per-copy token
        mutated = docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.when((F.col("doc_id") % 2 == 1) & (F.lit(i) > 0),
                   F.concat(F.col("text"), F.lit(f" copytok{i}")))
            .otherwise(F.col("text")).alias("text"),
        )
        copies = mutated if copies is None else copies.unionByName(mutated)
    if copies is not None:
        big_docs = copies.repartition(CPUS * 2).persist()
        n_big = big_docs.count()  # materialize outside the fence
        out["docs_rows"] = n_big
        assert n_big == n0 * COPIES

        op = OPERATORS.get("document_minhash_deduplicator")(
            text_key="text", id_key="doc_id", num_permutations=128,
            jaccard_threshold=0.7)
        t0 = time.time()
        kept = op.apply(big_docs).agg({"doc_id": "count"}).collect()[0][0]
        out["dedup_minhash_sec_10x"] = round(time.time() - t0, 3)
        out["dedup_minhash_kept"] = kept
        big_docs.unpersist()

    # ---- CDC replay at 10x events ---------------------------------
    root = tempfile.mkdtemp(prefix="scale_step_lake_")
    try:
        # Spill the synthetic binlog to parquet and replay FROM DISK —
        # a real replay tails a persisted log, and an in-memory
        # columnar cache of >=64M text events overwhelms a local-mode
        # heap (the executor storage region) long before the replay
        # path itself is stressed. Generation + write stay outside the
        # wall fence; the measured path reads the log like production.
        log_dir = os.path.join(root, "_binlog")
        generate_events(
            spark, EVENTS, batch_size=EVENTS // EPOCHS,
            n_repos=REPOS, n_paths=PATHS,
        ).write.parquet(log_dir)
        events = spark.read.parquet(log_dir)
        pipe = Pipeline([
            {"clean_copyright_mapper": {"text_key": "content"}},
            {"clean_email_mapper": {"text_key": "content"}},
            {"clean_links_mapper": {"text_key": "content"}},
            {"text_length_filter": {"min_len": 20, "max_len": 10**9,
                                    "text_key": "content"}},
        ])
        table = SnapshotTable(spark, root, ["repo", "path"],
                              num_buckets=64, strategy="mor",
                              compact_every=8)
        t0 = time.time()
        # cache=False: production log-tailing — each epoch is a pruned
        # scan of the on-disk log, never a whole-log columnar cache
        stats = CdcReplayer(table, pipeline=pipe).replay(events, cache=False)
        replay_dt = time.time() - t0
        snap = table.current_snapshot()
        if snap and snap.get("deltas"):
            table._compact(snap, epoch=snap["epoch"])
        dt = time.time() - t0
        out["cdc_replay_sec_10x"] = round(dt, 3)
        out["events_per_sec_cold_10x"] = round(EVENTS / dt, 1)
        per_epoch = EVENTS // max(EPOCHS, 1)
        steady = [s for s in stats[1:] if not s.skipped]
        steady_secs = sum(s.seconds for s in steady)
        if steady and steady_secs > 0:
            out["events_per_sec_10x"] = round(
                per_epoch * len(steady) / steady_secs, 1)
        # per-epoch walls separate the one-time cold costs (JVM/Arrow
        # warmup, empty->full initial table build) from the steady rate
        out["epoch_secs"] = [round(s.seconds, 2) for s in stats]
        out["final_compact_sec"] = round(dt - replay_dt, 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    out["load_1min_at_end"] = round(loadavg1(), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
