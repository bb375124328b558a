"""Deterministic synthetic CDC event log of source-code file changes.

Shape per FIXTURES.md F2 / BASELINE.json input_hint:
  seq:long, epoch:long, op:string(I/U/D),
  repo:string, path:string, commit:string, lang:string, content:string

Properties engineered for the test plan:
- skewed repo distribution (Zipf-ish: one hot repo takes ~40-50% of
  events) → exercises hot-key salting / AQE skew handling;
- I→U→D→I chains per key → last-wins + delete semantics;
- near-duplicate contents (whitespace/identifier mutations of shared
  templates) → MinHash dedup has real work;
- license headers / emails / links injected → cleaning mappers have
  real work;
- generation is pure numpy from a fixed seed and DISTRIBUTED: rows are
  synthesized inside mapInPandas from partition index ranges, so a
  10^7-event log never materializes on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType([
    T.StructField("seq", T.LongType(), False),
    T.StructField("epoch", T.LongType(), False),
    T.StructField("op", T.StringType(), False),
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("content", T.StringType(), True),
])

LANGS = ["python", "java", "c", "cpp", "go", "js", "md"]
EXT = {"python": "py", "java": "java", "c": "c", "cpp": "cc",
       "go": "go", "js": "js", "md": "md"}

_TEMPLATES = [
    "def handler_{i}(request):\n    value = compute_{i}(request.data)\n"
    "    if value is None:\n        return fallback()\n    return render(value)\n",
    "class Service_{i}:\n    def __init__(self, cfg):\n        self.cfg = cfg\n"
    "    def run(self):\n        for item in self.cfg.items:\n            process(item)\n",
    "func Process{i}(input []byte) (int, error) {{\n    total := 0\n"
    "    for _, b := range input {{\n        total += int(b)\n    }}\n    return total, nil\n}}\n",
    "static int util_{i}(const char *buf, size_t len) {{\n    size_t k;\n"
    "    int acc = 0;\n    for (k = 0; k < len; ++k) acc += buf[k];\n    return acc;\n}}\n",
    "export function widget{i}(props) {{\n  const state = useState(null);\n"
    "  return render(props, state);\n}}\n",
]

_LICENSE = (
    "/* Copyright (c) 2024 Example Corp.\n"
    " * Licensed under the Apache License, Version 2.0\n */\n"
)


def _synth_batch(seqs: np.ndarray, rng_base: int, n_repos: int, n_paths: int,
                 batch_size: int, hot_fraction: float,
                 content_repeat: int = 1) -> pd.DataFrame:
    """Vectorized event synthesis for a range of seq numbers. Every field
    is a pure function of seq (+ fixed seed), so regeneration is
    deterministic and resumable from any offset."""
    n = len(seqs)
    rng = np.random.RandomState(rng_base)
    # per-seq deterministic draws: use seq-indexed hashing, not sequential
    # rng state, so any subrange regenerates identically
    h1 = (seqs * 2654435761 + rng_base) % (2**31)
    h2 = (seqs * 40503 + 2654435761) % (2**31)
    h3 = (seqs * 69069 + 12345) % (2**31)

    # skew: hot_fraction of events hit repo 0
    hot = (h1 % 1000) < int(hot_fraction * 1000)
    repo_ids = np.where(hot, 0, 1 + (h2 % (n_repos - 1)))
    path_ids = h3 % n_paths
    lang_ids = (h1 // 7) % len(LANGS)
    tmpl_ids = (h2 // 11) % len(_TEMPLATES)
    variant = (h3 // 13) % 7
    op_draw = (h1 // 3) % 100
    # 70% upsert-new/update, 20% duplicate-ish update, 10% delete
    is_delete = op_draw >= 90

    rows = {
        "seq": seqs.astype(np.int64),
        "epoch": (seqs // batch_size).astype(np.int64),
        "op": np.where(is_delete, "D", np.where((h2 % 5) == 0, "I", "U")),
        "repo": np.char.add("org0/repo", repo_ids.astype(str)),
    }
    langs = np.array(LANGS)[lang_ids]
    exts = np.array([EXT[lg] for lg in LANGS])[lang_ids]
    rows["path"] = [
        f"src/pkg{p % 17}/mod{p}.{e}" for p, e in zip(path_ids, exts)
    ]
    commits = [f"{s:016x}{(s * 2654435761) % (2**64):016x}"[:40].ljust(40, "a")
               for s in seqs]
    rows["commit"] = commits
    rows["lang"] = langs

    contents = []
    for i in range(n):
        if is_delete[i]:
            contents.append(None)
            continue
        pid = int(path_ids[i])
        t = _TEMPLATES[tmpl_ids[i]].format(i=pid)
        if content_repeat > 1:
            # realistic file sizes (KBs): distinct function bodies, not
            # pure repetition, so n-gram/dedup stats stay meaningful
            t = "\n".join(
                _TEMPLATES[(tmpl_ids[i] + j) % len(_TEMPLATES)].format(
                    i=pid * 31 + j
                )
                for j in range(content_repeat)
            )
        v = int(variant[i])
        # near-duplicate mutations: whitespace / identifier tweaks
        if v == 1:
            t = t.replace("    ", "\t")
        elif v == 2:
            t = t.replace("value", "val").replace("total", "sum_")
        elif v == 3:
            t = _LICENSE + t
        elif v == 4:
            t = "# contact: dev@example.com  http://example.com/docs\n" + t
        elif v == 5:
            t = t + f"\n# rev {int(h1[i]) % 1000}\n"
        contents.append(t)
    rows["content"] = contents
    df = pd.DataFrame(rows)
    df["lang"] = df["lang"].where(~is_delete, None)
    df["commit"] = df["commit"].where(~is_delete, None)
    return df


def generate_events(
    spark: SparkSession,
    num_events: int,
    batch_size: int = 1000,
    n_repos: int = 50,
    n_paths: int = 400,
    hot_fraction: float = 0.45,
    seed: int = 42,
    num_partitions: int | None = None,
    content_repeat: int = 1,
) -> DataFrame:
    """Distributed deterministic event log [0, num_events)."""
    parts = num_partitions or spark.sparkContext.defaultParallelism
    bounds = spark.range(0, num_events, 1, parts)

    def gen(iterator):
        for pdf in iterator:
            seqs = pdf["id"].to_numpy()
            yield _synth_batch(seqs, seed, n_repos, n_paths, batch_size,
                               hot_fraction, content_repeat)

    return bounds.mapInPandas(gen, schema=EVENT_SCHEMA)
