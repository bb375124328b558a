"""nlpaug_en_mapper / nlpcda_zh_mapper — hermetic counterparts of the
reference's library-wrapping augmenters (same constructor surface, same
1→N output contract: nlpaug_en_mapper.py:141-170)."""

from __future__ import annotations

import pytest

import data_juicer_spark.operators  # noqa: F401
from data_juicer_spark.registry import OPERATORS


def make_df(spark, texts):
    return spark.createDataFrame(
        [(i, t, f"src{i}") for i, t in enumerate(texts)],
        "id long, text string, source string")


def test_nlpaug_row_count_contract_independent(spark):
    df = make_df(spark, ["the quick brown fox jumps over the lazy dog",
                         "pack my box with five dozen liquor jugs"])
    op = OPERATORS.get("nlpaug_en_mapper")(
        aug_num=2, delete_random_word=True, swap_random_char=True)
    out = op.apply(df).collect()
    # per row: 1 original + 2 methods x aug_num 2 = 5
    assert len(out) == 2 * 5
    # replicate fields carried through the explode
    assert {r["source"] for r in out} == {"src0", "src1"}


def test_nlpaug_sequential_and_no_original(spark):
    df = make_df(spark, ["alpha beta gamma delta epsilon zeta"])
    op = OPERATORS.get("nlpaug_en_mapper")(
        sequential=True, aug_num=3, keep_original_sample=False,
        delete_random_word=True, keyboard_error_char=True)
    texts = [r["text"] for r in op.apply(df).collect()]
    assert len(texts) == 3  # aug_num total when sequential
    assert "alpha beta gamma delta epsilon zeta" not in texts


def test_nlpaug_deterministic_and_actually_perturbs(spark):
    df = make_df(spark, ["one two three four five six seven eight"])
    op = OPERATORS.get("nlpaug_en_mapper")(aug_num=1, delete_random_word=True)
    a = sorted(r["text"] for r in op.apply(df).collect())
    b = sorted(r["text"] for r in op.apply(df).collect())
    assert a == b  # seeded per (text, method, k): shuffle-independent
    orig = "one two three four five six seven eight"
    assert orig in a
    [aug] = [t for t in a if t != orig]
    assert len(aug.split()) < len(orig.split())  # deletion shortens
    assert set(aug.split()) <= set(orig.split())


def test_nlpaug_no_methods_contract(spark):
    df = make_df(spark, ["just one row"])
    keep = OPERATORS.get("nlpaug_en_mapper")()
    assert keep.apply(df).count() == 1
    drop = OPERATORS.get("nlpaug_en_mapper")(keep_original_sample=False)
    assert drop.apply(df).count() == 0


def test_nlpcda_equivalent_num_and_homophone(spark):
    df = make_df(spark, ["这里一共有5种不同的数据增强方法"])
    op = OPERATORS.get("nlpcda_zh_mapper")(
        aug_num=1, replace_equivalent_num=True,
        keep_original_sample=False)
    [row] = op.apply(df).collect()
    assert row["text"] == "这里一共有五种不同的数据增强方法"

    op2 = OPERATORS.get("nlpcda_zh_mapper")(
        aug_num=1, replace_similar_word=True, keep_original_sample=False)
    [row2] = op2.apply(df).collect()
    assert row2["text"].startswith("这边")  # 这里 -> 这边


def test_augment_rejects_bad_aug_num():
    with pytest.raises(ValueError, match="aug_num"):
        OPERATORS.get("nlpaug_en_mapper")(aug_num=0, delete_random_word=True)


def test_digit_corpus_method_invariance():
    """Locks the premise of the mapper_nlpaug_fanout /
    mapper_nlpcda_fanout oracle rows (__spark_entry__.py): single-digit
    texts from {3,4,7} are invariant under 8 of the 9 EN methods and 4
    of the 5 zh methods for EVERY variant seed, and zh
    replace_equivalent_num maps them deterministically to 三/四/七. If
    a method table or _pick policy change breaks any of these, this
    fails before the driver's oracle does."""
    from data_juicer_spark.operators.augment import (
        EN_METHODS, ZH_METHODS, _rng)

    zh_map = {"3": "三", "4": "四", "7": "七"}
    for d in "347":
        for name, fn in EN_METHODS.items():
            if name == "insert_random_char":
                continue  # inserts an RNG char — excluded from the row
            for k in range(5):
                assert fn(d, _rng(d, name, k)) == d, (d, name, k)
        for name, fn in ZH_METHODS.items():
            exp = zh_map[d] if name == "replace_equivalent_num" else d
            for k in range(5):
                assert fn(d, _rng(d, name, k)) == exp, (d, name, k)
