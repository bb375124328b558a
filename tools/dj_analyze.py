"""dj-analyze mirror (/root/reference/tools/analyze_data.py → Analyzer,
SURVEY.md §3.3): run ONLY the stats phase of every Filter in the recipe,
export the per-stat overall summary, histograms, and the stat
correlation matrix.

Usage: python tools/dj_analyze.py --config recipe.yaml [--out DIR]
Prints one JSON line; writes overall/correlation frames as json under
--out when given.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(config_path: str, out_dir: str | None = None,
        parallelism: int | None = None) -> dict:
    import yaml

    from data_juicer_spark import get_spark
    from data_juicer_spark.analysis.analyzer import Analyzer
    from data_juicer_spark.sources.builder import DatasetBuilder

    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    spark = get_spark(parallelism=parallelism, app_name="dj-analyze")
    builder = DatasetBuilder(spark)
    if cfg.get("datapath"):
        configs = builder.parse_cli_datapath(cfg["datapath"])
    else:
        dp = cfg["dataset_path"]
        configs = [dp] if isinstance(dp, str) else dp
    df = builder.load(configs, max_sample_num=cfg.get("max_sample_num"))
    an = Analyzer(cfg.get("process", []))
    overall = an.overall(df)
    corr = an.correlation(df)
    if out_dir:
        overall.coalesce(1).write.mode("overwrite").json(
            os.path.join(out_dir, "overall"))
        corr.coalesce(1).write.mode("overwrite").json(
            os.path.join(out_dir, "correlation"))
    return {
        "stats": [r["stat"] for r in overall.select("stat").collect()],
        "n_correlations": corr.count(),
        "out": out_dir,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--parallelism", type=int, default=None)
    args = ap.parse_args()
    print(json.dumps(run(args.config, out_dir=args.out,
                         parallelism=args.parallelism)))


if __name__ == "__main__":
    main()
