"""Reference goldens for topk_specified_field_selector
(tests/ops/selector/test_topk_specified_field_selector.py:17-679):
nested dotted field keys, min(top_ratio·n, topk) when both are set,
None → ∓maxsize sentinel (always sorts last), string values parsed as
floats ('' unparseable → last), original-order tiebreak (doc_id here).
"""

from __future__ import annotations

import data_juicer_spark.operators  # noqa: F401
from data_juicer_spark.registry import OPERATORS

NUM_KEY2 = [34.0, 243.0, None, 18.0, 551.0, 89.0, 354.32, 354.32, 33.0,
            18.0]
ASC_KEY2 = [34.0, 243.0, None, 18.0, 551.0, 89.0, 354.32, 354.32, 33.0,
            2.0]
STR_KEY2 = ["34", "243", "", None, "551", "89", "354.32", "354.32",
            "33", "2"]


def _df(spark, key2_vals, typ):
    rows = [(i, (((v,),),)) for i, v in enumerate(key2_vals)]
    return spark.createDataFrame(
        rows, f"doc_id long, meta struct<key1:struct<key2:"
              f"struct<count:{typ}>>>")


def _select(spark, key2_vals, typ, **kw):
    op = OPERATORS.get("topk_specified_field_selector")(
        field_key="meta.key1.key2.count", id_key="doc_id", **kw)
    return sorted(r["doc_id"]
                  for r in op.apply(_df(spark, key2_vals, typ)).collect())


def test_topratio_select(spark):
    # n=10, ratio .2 → 2 < topk 5; tie at 354.32 broken by earlier row
    got = _select(spark, NUM_KEY2, "double",
                  top_ratio=0.2, topk=5, reverse=True)
    assert got == [4, 6]


def test_topk_select(spark):
    # ratio .5 → 5, topk 4 is smaller
    got = _select(spark, NUM_KEY2, "double",
                  top_ratio=0.5, topk=4, reverse=True)
    assert got == [1, 4, 6, 7]


def test_reverse_select(spark):
    # ascending: None sentinel sorts last, both 18s beat 33? no — k=3:
    # 2.0, 18.0 (earlier of the two), 18.0 → reference picks 2,18,18?
    # reference tgt is [2, 18, 33] because its ds has ONE 18 here
    got = _select(spark, ASC_KEY2, "double",
                  top_ratio=0.5, topk=3, reverse=False)
    assert got == [3, 8, 9]


def test_str_select(spark):
    # strings parse as floats; '' and None → +maxsize sentinel (last)
    got = _select(spark, STR_KEY2, "string",
                  top_ratio=0.5, topk=3, reverse=False)
    assert got == [0, 8, 9]


# -- frequency selector (test_frequency_specified_field_selector.py) --

FREQ_SUFFIX = [".pdf", ".docx", ".txt", ".html", ".pdf", ".py", ".java",
               ".html", ".pdf", ".xml"]
FREQ_COUNTS = [34.0, 243.0, None, 34.0, 551.0, 89.0, 354.32, 354.32,
               34.0, 18.0]


def _freq_select(spark, vals, typ, **kw):
    rows = [(i, (((v,),),)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, f"doc_id long, meta struct<key1:struct<key2:"
              f"struct<count:{typ}>>>")
    op = OPERATORS.get("frequency_specified_field_selector")(
        field_key="meta.key1.key2.count", id_key="doc_id", **kw)
    return sorted(r["doc_id"] for r in op.apply(df).collect())


def test_freq_topratio_select(spark):
    # 7 distinct suffixes, ratio .3 → int(2.1)=2 groups (.pdf ×3, .html ×2)
    rows = [(i, (v,)) for i, v in enumerate(FREQ_SUFFIX)]
    df = spark.createDataFrame(rows,
                               "doc_id long, meta struct<suffix:string>")
    op = OPERATORS.get("frequency_specified_field_selector")(
        field_key="meta.suffix", top_ratio=0.3, topk=5, id_key="doc_id")
    got = sorted(r["doc_id"] for r in op.apply(df).collect())
    assert got == [0, 3, 4, 7, 8]


def test_freq_topk_select(spark):
    # ratio .4 → 2.8, topk 2 smaller → groups 34 (×3) and 354.32 (×2)
    got = _freq_select(spark, FREQ_COUNTS, "double",
                       top_ratio=0.4, topk=2)
    assert got == [0, 3, 6, 7, 8]


def test_freq_reverse_select(spark):
    # ascending count, ties broken by first appearance: 243 (row 1),
    # then the None group (row 2) — None is a legal value group
    got = _freq_select(spark, FREQ_COUNTS, "double",
                       top_ratio=0.4, topk=2, reverse=False)
    assert got == [1, 2]


# -- range selector (test_range_specified_field_selector.py) ----------

def _range_select(spark, vals, typ, **kw):
    rows = [(i, (((v,),),)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, f"doc_id long, meta struct<key1:struct<key2:"
              f"struct<count:{typ}>>>")
    op = OPERATORS.get("range_specified_field_selector")(
        field_key="meta.key1.key2.count", id_key="doc_id", **kw)
    return sorted(r["doc_id"] for r in op.apply(df).collect())


def test_range_percentile_select(spark):
    vals = [5.0, 63.0, 23.0, 48.0, 78.0, 3.0, 67.0, 32.0, 33.0, 48.0]
    rows = [(i, ((v,),)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "doc_id long, meta struct<key1:struct<count:double>>")
    op = OPERATORS.get("range_specified_field_selector")(
        field_key="meta.key1.count", lower_percentile=0.78,
        upper_percentile=0.9, lower_rank=5, upper_rank=10,
        id_key="doc_id")
    got = sorted(r["doc_id"] for r in op.apply(df).collect())
    assert got == [1, 6]  # values 63 and 67 (ranks 7 and 8)


def test_range_rank_select(spark):
    vals = [34.0, 243.0, None, 18.0, 551.0, 89.0, 354.32, 354.32, 33.0,
            18.0]
    got = _range_select(spark, vals, "double", lower_percentile=0.3,
                        upper_percentile=1.0, lower_rank=7, upper_rank=9)
    assert got == [6, 7]  # the two 354.32 rows


def test_range_percentile_rank_select(spark):
    vals = [34.0, 243.0, None, 18.0, 551.0, 89.0, 354.32, 354.32, 33.0,
            2.0]
    got = _range_select(spark, vals, "double", lower_percentile=0.7,
                        upper_percentile=1.0, lower_rank=3, upper_rank=9)
    assert got == [6, 7]


def test_range_list_select(spark):
    vals = [[34.0], [243.0], [], None, [551.0], [89.0], [354.32],
            [354.32], [33.0, 33.0], [2.0, 2.0]]
    got = _range_select(spark, vals, "array<double>",
                        lower_percentile=0.0, upper_percentile=0.5,
                        lower_rank=2, upper_rank=4)
    assert got == [8, 9]  # list means 33.0 and 2.0 at ranks 2, 3


def test_range_no_bounds_identity(spark):
    vals = [1.0, 2.0, 3.0]
    got = _range_select(spark, vals, "double")
    assert got == [0, 1, 2]  # reference early-return contract


# -- groupers (tests/ops/grouper/test_*.py) ---------------------------

def test_key_value_grouper_golden(spark):
    rows = [(0, "Today is Sunday and it's a happy day!", ("en",)),
            (1, "Welcome to Alibaba.", ("en",)),
            (2, "欢迎来到阿里巴巴！", ("zh",))]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, meta struct<language:string>")
    op = OPERATORS.get("key_value_grouper")(
        group_by_keys=["meta.language"], id_key="doc_id")
    by_lang = {row[0]: row["text"] for row in op.apply(df).collect()}
    assert by_lang["en"] == ["Today is Sunday and it's a happy day!",
                             "Welcome to Alibaba."]
    assert by_lang["zh"] == ["欢迎来到阿里巴巴！"]


def test_key_value_grouper_defaults_to_text(spark):
    # no keys → group by the text column itself (reference default)
    df = spark.createDataFrame([(0, "a"), (1, "a"), (2, "b")],
                               "doc_id long, text string")
    op = OPERATORS.get("key_value_grouper")(id_key="doc_id")
    got = {r["text"]: sorted(r["doc_id"]) for r in op.apply(df).collect()}
    assert got == {"a": [0, 1], "b": [2]}


def test_naive_then_reverse_roundtrip_golden(spark):
    texts = ["Today is Sunday and it's a happy day!",
             "Sur la plateforme MT4, plusieurs manières d'accéder à \n"
             "ces fonctionnalités sont conçues simultanément.",
             "欢迎来到阿里巴巴！"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    batched = OPERATORS.get("naive_grouper")(id_key="doc_id").apply(df)
    row = batched.first()
    assert row["text"] == texts  # one batched row, dataset order
    back = OPERATORS.get("naive_reverse_grouper")().apply(batched)
    assert sorted(r["text"] for r in back.collect()) == sorted(texts)


# -- random selector (test_random_selector.py contract) ---------------

def test_random_selector_exact_counts(spark):
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    op = OPERATORS.get("random_selector")
    assert op(select_ratio=0.3).apply(df).count() == 30      # exact
    assert op(select_num=7).apply(df).count() == 7
    # both set → the smaller sample wins (reference contract)
    assert op(select_ratio=0.3, select_num=5).apply(df).count() == 5
    assert op(select_ratio=0.03, select_num=50).apply(df).count() == 3
    # neither set → unchanged
    assert op().apply(df).count() == 100
    # seeded determinism
    a = sorted(r["doc_id"] for r in op(select_num=10).apply(df).collect())
    b = sorted(r["doc_id"] for r in op(select_num=10).apply(df).collect())
    assert a == b


def test_selector_reference_edge_contracts(spark):
    """Falsy ratio 0.0 counts as unset; empty field_key and n<=1 return
    the dataset unchanged (reference early-return contracts)."""
    df = spark.range(20).withColumnRenamed("id", "doc_id")
    df = df.withColumn("v", df["doc_id"] * 2)
    topk = OPERATORS.get("topk_specified_field_selector")
    assert topk(field_key="v", topk=5, top_ratio=0.0).apply(df).count() == 5
    assert topk(topk=5).apply(df).count() == 20          # empty field_key
    assert topk(field_key="v").apply(df).count() == 20   # nothing to select by
    freq = OPERATORS.get("frequency_specified_field_selector")
    assert freq(field_key="v", topk=3, top_ratio=0.0).apply(df).count() > 0
    assert freq(field_key="v").apply(df).count() == 20   # both unset
    rnd = OPERATORS.get("random_selector")
    assert rnd(select_ratio=0.0, select_num=10).apply(df).count() == 10
    one = spark.range(1).withColumnRenamed("id", "doc_id")
    assert rnd(select_ratio=0.4).apply(one).count() == 1  # n<=1 unchanged
    rng = OPERATORS.get("range_specified_field_selector")
    assert rng(field_key="doc_id", lower_percentile=0.0,
               upper_percentile=0.5).apply(one).count() == 1


def test_tags_selector_golden(spark):
    """Ports tests/ops/selector/test_tags_specified_field_selector.py."""
    rows = [(0, ("happy",)), (1, ("happy",)), (2, ("sad",)),
            (3, ("angry",))]
    df = spark.createDataFrame(rows,
                               "doc_id long, meta struct<sentiment:string>")
    op = OPERATORS.get("tags_specified_field_selector")(
        field_key="meta.sentiment", target_tags=["happy", "sad"])
    assert sorted(r["doc_id"] for r in op.apply(df).collect()) == [0, 1, 2]


def test_reverse_grouper_batch_meta_export(spark, tmp_path):
    """Ports test_naive_reverse_grouper.py's rm_unbatched_keys cases:
    batch_meta is exported as JSON lines and stripped from the rows."""
    import json
    import os

    df = spark.createDataFrame(
        [((["a", "b"]), ("k1",)), ((["c"]), ("k2",))],
        "text array<string>, batch_meta struct<query:string>")
    path = os.path.join(tmp_path, "meta", "bm.jsonl")
    op = OPERATORS.get("naive_reverse_grouper")(
        batch_meta_export_path=path)
    out = op.apply(df)
    assert sorted(r["text"] for r in out.collect()) == ["a", "b", "c"]
    assert "batch_meta" not in out.columns
    metas = [json.loads(line) for line in open(path)]
    assert sorted(m["query"] for m in metas) == ["k1", "k2"]
    # no export path → batch_meta silently dropped (reference contract)
    out2 = OPERATORS.get("naive_reverse_grouper")().apply(df)
    assert "batch_meta" not in out2.columns and out2.count() == 3


def test_random_selector_key_distinguishes_null_layouts(spark):
    """concat_ws-style keys collapse (NULL,'x') with ('x',NULL) — the
    per-column-md5 key must not: with 4 distinct rows and an exact-count
    cut the same rows are selected under any partition layout."""
    rows = [(None, "x"), ("x", None), ("x", "x"), (None, None)]
    df = spark.createDataFrame(rows, "a string, b string")
    op = OPERATORS.get("random_selector")(select_num=2, seed=7)
    def norm(frame):
        return sorted((r["a"] or "", r["b"] or "") for r in frame.collect())

    picked1 = norm(op.apply(df.repartition(1)))
    picked7 = norm(op.apply(df.repartition(7)))
    assert len(picked1) == 2
    assert picked1 == picked7
