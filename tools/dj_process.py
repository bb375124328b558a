"""dj-process mirror — the reference's main CLI entry point
(/root/reference/tools/process_data.py:19-32 → DefaultExecutor,
SURVEY.md §3.1) on Spark: YAML config → DatasetBuilder load → Pipeline
(one lazy Catalyst DAG) → Exporter write, with optional per-op row
counts (the Monitor mirror).

Config layout (same shape as the reference's recipes):

    dataset_path: /path/ds.parquet          # or a CLI-datapath string
    export_path: /path/out                  # directory
    export_format: parquet                  # jsonl/json/csv/tsv/parquet
    export_shards: 4                        # optional
    max_sample_num: 100000                  # optional
    text_key: text                          # optional fallthrough
    process:
      - whitespace_normalization_mapper: {}
      - text_length_filter: {min_len: 10}

Usage: python tools/dj_process.py --config recipe.yaml [--op-stats]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(config_path: str, op_stats: bool = False,
        parallelism: int | None = None) -> dict:
    import yaml

    from data_juicer_spark import get_spark
    from data_juicer_spark.pipeline import Pipeline
    from data_juicer_spark.sources.builder import DatasetBuilder, Exporter

    with open(config_path) as f:
        cfg = yaml.safe_load(f)

    # parallelism=None lets get_spark resolve $SPARK_GRAFT_CPUS and reuse
    # an active session — don't pre-empt its default chain
    spark = get_spark(parallelism=parallelism, app_name="dj-process")
    builder = DatasetBuilder(spark)
    # `dataset_path`: one path or a list of path/config dicts (paths may
    # contain spaces); `datapath`: the reference's CLI grammar string
    # ("w1 ds1.jsonl w2 ds2_dir") — explicit key, no space heuristics
    if cfg.get("datapath"):
        configs = builder.parse_cli_datapath(cfg["datapath"])
    else:
        dp = cfg["dataset_path"]
        configs = [dp] if isinstance(dp, str) else dp
    df = builder.load(configs, max_sample_num=cfg.get("max_sample_num"))

    process = cfg.get("process", [])
    if cfg.get("text_key"):
        # fallthrough text_key like the reference's global config key
        process = [
            {name: {"text_key": cfg["text_key"], **(kw or {})}}
            for entry in process
            for name, kw in ([(entry, {})] if isinstance(entry, str)
                             else entry.items())
        ]
    pipe = Pipeline(process, observe=op_stats)
    out = pipe.apply(df)

    Exporter.export(out, cfg["export_path"],
                    fmt=cfg.get("export_format", "parquet"),
                    num_shards=cfg.get("export_shards"))
    result = {"export_path": cfg["export_path"],
              "ops": len(pipe.ops)}
    if op_stats:
        result["op_stats"] = pipe.op_stats()
    return result


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--op-stats", action="store_true",
                    help="print per-op row counts (Monitor mirror)")
    ap.add_argument("--parallelism", type=int, default=None)
    args = ap.parse_args()
    print(json.dumps(run(args.config, op_stats=args.op_stats,
                         parallelism=args.parallelism)))


if __name__ == "__main__":
    main()
