"""dj-replay — the north-rule launch mode: CDC binlog replay into a
keyed lake table as a `spark-submit --py-files` job.

The reference ships its executors as Ray actors launched by
`tools/process_data.py` in ray mode (SURVEY.md §3); here the equivalent
production entry is a plain spark-submit application: the cluster
manager provides the SparkSession, `--py-files data_juicer_spark.zip`
provides the package on every executor's python path, and this script
is the application file.

    # package once
    python -c "from data_juicer_spark.session import build_pyfiles_zip;\
 print(build_pyfiles_zip())"

    # run (any master: yarn, k8s, local[N], local-cluster[K,C,M])
    spark-submit --master local[8] \
        --py-files /tmp/data_juicer_spark_pyfiles.zip \
        tools/dj_replay.py \
        --events /data/binlog.parquet --table-root /lake/src_files \
        --key-cols repo,path --buckets 64 --pipeline recipe.yaml

Replays epoch by epoch (epoch = `epoch` column of the event log) with
the engine's exactly-once guarantees: the table's committed epoch is
the checkpoint, so re-submitting the SAME job after a crash (or
double-delivery) skips every already-committed epoch — the JSON report
counts those skips, which is the idempotence/resume evidence. Emits ONE
JSON line with lineage + throughput + an order-independent digest of
the final table state (same digest across cluster sizes = the
correctness half of the two-cluster-size scaling criterion).

Synthetic mode (--synthetic N) replays the seeded deterministic binlog
from data_juicer_spark.cdc.events — useful for scaling runs where both
cluster sizes must see byte-identical input without sharing storage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# local runs from a repo checkout; under spark-submit --py-files the
# package resolves from the shipped zip instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def state_digest(df, key_cols):
    """Order-independent digest of (keys, content sha256): sum of the
    per-row xxhash64 as a 38-digit decimal. One aggregate — no collect,
    no sort — so it stays O(rows/cores) at any table size."""
    from pyspark.sql import functions as F

    row_hash = F.xxhash64(*[F.col(c) for c in key_cols], F.col("content_sha256"))
    agg = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.coalesce(F.sum(row_hash.cast("decimal(38,0)")),
                   F.lit(0).cast("decimal(38,0)")).alias("digest"),
    ).first()
    return int(agg["rows"]), str(agg["digest"])


def run(args) -> dict:
    import yaml

    from data_juicer_spark import get_spark
    from data_juicer_spark.cdc import CdcReplayer, generate_events
    from data_juicer_spark.lake import SnapshotTable
    from data_juicer_spark.pipeline import Pipeline
    from pyspark.sql import functions as F

    # under spark-submit the master comes from the launcher; an explicit
    # builder.master() would override it, so thread it through
    from pyspark import SparkConf

    submit_master = SparkConf().get("spark.master", None)
    spark = get_spark(app_name="dj-replay", master=submit_master)
    # make the run cwd-independent: ship the package zip to executor
    # python workers even in plain-python local launches (under
    # spark-submit --py-files this re-adds the identical zip, a no-op)
    from data_juicer_spark.session import ship_package

    ship_package(spark)
    if args.synthetic:
        events = generate_events(
            spark, args.synthetic, batch_size=args.batch_size,
            n_repos=args.synthetic_repos, n_paths=args.synthetic_paths,
            content_repeat=args.synthetic_repeat)
    else:
        events = spark.read.parquet(args.events)

    pipeline = None
    if args.pipeline:
        with open(args.pipeline) as f:
            cfg = yaml.safe_load(f)
        pipeline = Pipeline(cfg["process"] if isinstance(cfg, dict) else cfg)

    key_cols = args.key_cols.split(",")
    table = SnapshotTable(spark, args.table_root, key_cols,
                          num_buckets=args.buckets, strategy=args.strategy,
                          compact_every=args.compact_every)
    replayer = CdcReplayer(table, pipeline=pipeline,
                           text_key=args.text_key,
                           salt_buckets=args.salt_buckets)
    # start at epoch 0 instead of the resume default: the epoch fence
    # makes already-committed epochs cheap no-ops, and their `skipped`
    # lineage rows are the exactly-once / resume evidence in the report
    t0 = time.time()
    lineage = replayer.replay(events, start_epoch=0)
    wall = time.time() - t0

    replayed = [st for st in lineage if not st.skipped]
    n_events = sum(st.events for st in replayed)
    final = table.read().select(
        *key_cols, F.sha2(F.col(args.text_key), 256).alias("content_sha256"))
    rows, digest = state_digest(final, key_cols)
    return {
        "epochs_total": len(lineage),
        "epochs_replayed": len(replayed),
        "epochs_skipped_already_committed": sum(st.skipped for st in lineage),
        "events": n_events,
        "upserts": sum(st.upserts for st in replayed),
        "deletes": sum(st.deletes for st in replayed),
        "filtered_out": sum(st.filtered_out for st in replayed),
        "wall_sec": round(wall, 3),
        "events_per_sec": round(n_events / wall, 1) if n_events else 0.0,
        "final_rows": rows,
        "state_digest": digest,
        "committed_epoch": table.current_epoch(),
        "per_epoch": [
            {"epoch": st.epoch, "events": st.events, "upserts": st.upserts,
             "deletes": st.deletes, "skipped": st.skipped,
             "sec": round(st.seconds, 3), "snapshot": st.snapshot_id}
            for st in lineage
        ],
    }


def main() -> None:
    ap = argparse.ArgumentParser(
        description="CDC binlog replay into a keyed lake table "
                    "(spark-submit application)")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--events", help="parquet path of the event log "
                     "(seq, epoch, op, key cols..., payload cols...)")
    src.add_argument("--synthetic", type=int, metavar="N",
                     help="replay the seeded deterministic N-event binlog")
    ap.add_argument("--table-root", required=True)
    ap.add_argument("--key-cols", default="repo,path")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--strategy", choices=["mor", "cow"], default="mor")
    ap.add_argument("--compact-every", type=int, default=8)
    ap.add_argument("--pipeline", help="YAML with a `process:` op list")
    ap.add_argument("--text-key", default="content")
    ap.add_argument("--salt-buckets", type=int, default=0,
                    help="two-level compaction reduce for adversarial "
                         "single-key floods")
    ap.add_argument("--batch-size", type=int, default=1000,
                    help="synthetic mode: events per epoch")
    ap.add_argument("--synthetic-repos", type=int, default=50)
    ap.add_argument("--synthetic-paths", type=int, default=400)
    ap.add_argument("--synthetic-repeat", type=int, default=1)
    args = ap.parse_args()
    print(json.dumps(run(args)))


if __name__ == "__main__":
    main()
