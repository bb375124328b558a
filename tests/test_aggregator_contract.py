"""Aggregator/grouper contract goldens derived from the reference's
aggregator unit tests (tests/ops/aggregator/test_nested_aggregator.py,
test_meta_tags_aggregator.py).

The reference aggregators are LLM-API summarizers (documented non-goal,
SURVEY §7.3) but their tests carry DETERMINISTIC sub-assertions that
pin the surrounding contract independent of any model text:
  - grouping shape: run() preserves sample count — aggregation attaches
    batch-level metadata, it never drops or reshapes the group rows;
  - batch_meta key handling: the result lands under Fields.batch_meta
    [output_key], with output_key defaulting to the input key and both
    overridable (test_input_output);
  - meta values may be a STRING or a LIST of strings per row
    (test_tag_list vs test_default_aggregator).
These cases pin GroupStatsAggregator + the grouper round-trip to the
same contract, using the reference tests' own sample shapes."""

import json

import pytest
from pyspark.sql import functions as F

from data_juicer_spark.registry import OPERATORS
import data_juicer_spark.operators  # noqa: F401

# the reference's nested_aggregator sample: 5 event_description meta
# rows of one group (test_nested_aggregator.py:32-41)
EVENT_DESCS = [
    "十年前，李相夷十五岁战胜西域天魔成为天下第一高手。",
    "有人视李相夷为中原武林的希望，但也有人以战胜他为目标。",
    "在东海的一艘船上，李相夷独自一人对抗金鸳盟的高手。",
    "十年后，李莲花在一个寒酸的莲花楼内醒来。",
    "小镇上的皮影戏摊讲述李相夷和笛飞声的故事。",
]

# the meta_tags_aggregator samples: scalar tags and list tags
# (test_meta_tags_aggregator.py:30-48, :87-108)
SCALAR_TAGS = ["开心", "快乐", "难过", "不开心", "愤怒"]
LIST_TAGS = [["开心", "平静"], ["快乐", "开心", "幸福"], ["难过"],
             ["不开心", "没头脑", "不高兴"], ["愤怒", "愤慨"]]


def test_group_roundtrip_preserves_sample_count(spark):
    """Reference assertion `len(new_dataset) == len(samples)`: grouping
    then un-grouping must reproduce the original rows exactly."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EVENT_DESCS)],
        "id long, event_description string")
    batched = OPERATORS.get("naive_grouper")(id_key="id").apply(df)
    assert batched.count() == 1  # whole dataset -> one batched row
    back = OPERATORS.get("naive_reverse_grouper")().apply(batched)
    rows = sorted((r["id"], r["event_description"])
                  for r in back.collect())
    assert rows == [(i, t) for i, t in enumerate(EVENT_DESCS)]


def test_batch_meta_attached_and_stripped(spark, tmp_path):
    """batch_meta key handling: an aggregator's group-level output
    rides a `batch_meta` column; naive_reverse_grouper exports it as
    JSON lines and STRIPS it from the row output (the reference writes
    Fields.batch_meta beside the samples; :36-51)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EVENT_DESCS)],
        "id long, event_description string")
    batched = OPERATORS.get("naive_grouper")(id_key="id").apply(df)
    # deterministic group-level summary in place of the LLM text:
    # n_docs + total chars of the group (non-empty, like the reference
    # asserts its batch_meta value is non-empty)
    batched = batched.withColumn(
        "batch_meta",
        F.struct(
            F.size("event_description").alias("n_docs"),
            F.aggregate("event_description", F.lit(0),
                        lambda acc, x: acc + F.length(x)).alias("n_chars"),
        ))
    out_path = str(tmp_path / "batch_meta.jsonl")
    back = OPERATORS.get("naive_reverse_grouper")(
        batch_meta_export_path=out_path).apply(batched)
    assert "batch_meta" not in back.columns  # stripped
    assert back.count() == len(EVENT_DESCS)  # sample count preserved
    metas = [json.loads(ln) for ln in open(out_path)]
    assert metas == [{"n_docs": 5,
                      "n_chars": sum(len(t) for t in EVENT_DESCS)}]
    assert metas[0]["n_chars"] > 0  # "assertNotEqual(..., '')" analogue


def test_output_key_override_contract(spark):
    """test_input_output analogue: the grouped column keeps the caller's
    input key name, and the group summary can be emitted under a custom
    output key."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EVENT_DESCS)],
        "id long, sub_docs string")
    batched = OPERATORS.get("naive_grouper")(id_key="id").apply(df)
    assert "sub_docs" in batched.columns  # input_key preserved
    out = batched.select(
        F.aggregate("sub_docs", F.lit(0),
                    lambda acc, x: acc + F.length(x)).alias("text"))
    r = out.collect()[0]
    assert r["text"] == sum(len(t) for t in EVENT_DESCS)


def test_scalar_and_list_tags_group_shape(spark):
    """meta_tags_aggregator accepts scalar-tag and list-tag rows
    (test_default_aggregator vs test_tag_list): tag frequency over both
    shapes via one flatten + groupBy, with target-tag mapping reduced
    to the deterministic exact-match subset (the synonym folding is the
    LLM part)."""
    scalar = spark.createDataFrame(
        [(i, t) for i, t in enumerate(SCALAR_TAGS)], "id long, tag string")
    lists = spark.createDataFrame(
        [(i, t) for i, t in enumerate(LIST_TAGS)],
        "id long, tags array<string>")
    # scalar rows: one tag each -> 5 distinct tags, count 1 apiece
    freq = scalar.groupBy("tag").count().collect()
    assert sorted((r["tag"], r["count"]) for r in freq) == sorted(
        (t, 1) for t in SCALAR_TAGS)
    # list rows flatten to 11 tags, '开心' appears twice
    flat = lists.select(F.explode("tags").alias("tag")).groupBy(
        "tag").count()
    got = {r["tag"]: r["count"] for r in flat.collect()}
    assert sum(got.values()) == sum(len(t) for t in LIST_TAGS)
    assert got["开心"] == 2
    # target-tag projection: exact matches kept, everything else folds
    # to the catch-all '其他' (reference target_tags=['开心','难过','其他'])
    target = ["开心", "难过"]
    mapped = (lists.select(F.explode("tags").alias("tag"))
              .withColumn("tag", F.when(F.col("tag").isin(target),
                                        F.col("tag")).otherwise("其他"))
              .groupBy("tag").count())
    got = {r["tag"]: r["count"] for r in mapped.collect()}
    assert got == {"开心": 2, "难过": 1, "其他": 8}


def test_group_stats_aggregator_goldens(spark):
    """GroupStatsAggregator numeric golden: hand-computed count/avg/
    min/max/stddev per group, incl. the single-row group whose sample
    stddev is NULL (stddev_samp semantics — undefined for n=1, like
    pandas std)."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0)],
        "grp string, val double")
    op = OPERATORS.get("group_stats_aggregator")(
        group_keys=["grp"], value_col="val")
    rows = {r["grp"]: r for r in op.apply(df).collect()}
    a = rows["a"]
    assert (a["cnt"], a["avg_val"], a["min_val"], a["max_val"]) == \
        (3, 2.0, 1.0, 3.0)
    assert a["std_val"] == 1.0  # sample stddev of [1,2,3]
    b = rows["b"]
    assert (b["cnt"], b["avg_val"], b["min_val"], b["max_val"]) == \
        (1, 10.0, 10.0, 10.0)
    assert b["std_val"] is None  # n=1 -> sample stddev undefined
