"""Deduplicator goldens — mirrors the reference's dedup unit tests
(tests/ops/deduplicator/test_document_minhash_deduplicator.py pattern:
near-identical long texts must cluster, short distinct texts must not,
keep-first-by-order semantics)."""

import numpy as np

import data_juicer_spark.operators  # noqa: F401
from data_juicer_spark.operators.dedup import (
    minhash_permutations, optimal_param, connected_components,
)
from data_juicer_spark.registry import OPERATORS

LONG_A = (
    "Distributed data processing engines partition work across many "
    "machines and shuffle intermediate results between stages to compute "
    "joins aggregations and window functions over very large datasets."
)
LONG_A_NEAR = (
    "Distributed data processing engines partition work across many "
    "machines and shuffle intermediate results between stages to compute "
    "joins aggregations and window functions over very large data sets."
)
SHORT_B = "completely different tiny text"
SHORT_C = "another unrelated snippet entirely"


def make_df(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["id", "text"])


def kept(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_exact_dedup_keep_first(spark):
    df = make_df(spark, ["same text", "same text", "other", "same text"])
    op = OPERATORS.get("document_deduplicator")(id_key="id")
    assert kept(op.apply(df)) == [0, 2]


def test_exact_dedup_lowercase(spark):
    df = make_df(spark, ["Hello World", "hello world", "HELLO WORLD"])
    assert kept(OPERATORS.get("document_deduplicator")(id_key="id").apply(df)) == [0, 1, 2]
    assert kept(
        OPERATORS.get("document_deduplicator")(id_key="id", lowercase=True).apply(df)
    ) == [0]


def test_exact_dedup_ignore_non_character(spark):
    df = make_df(spark, ["a b c!", "abc", "x y z"])
    op = OPERATORS.get("document_deduplicator")(id_key="id", ignore_non_character=True)
    assert kept(op.apply(df)) == [0, 2]


def test_minhash_permutations_match_reference_math(spark):
    # identical generation to RandomState(42) pairs
    a, b = minhash_permutations(16)
    gen = np.random.RandomState(seed=42)
    prime = np.uint64((1 << 61) - 1)
    exp = np.array(
        [(gen.randint(1, prime, dtype=np.uint64),
          gen.randint(0, prime, dtype=np.uint64)) for _ in range(16)],
        dtype=np.uint64,
    ).T
    assert (a == exp[0]).all() and (b == exp[1]).all()


def test_optimal_param_reasonable():
    b, r = optimal_param(0.7, 256)
    assert b * r <= 256 and b > 1 and r > 1


def test_minhash_dedup_clusters_near_dups(spark):
    df = make_df(spark, [LONG_A, LONG_A_NEAR, SHORT_B, SHORT_C])
    op = OPERATORS.get("document_minhash_deduplicator")(
        id_key="id", num_permutations=128, jaccard_threshold=0.7
    )
    assert kept(op.apply(df)) == [0, 2, 3]


def test_minhash_dedup_distinct_survive(spark):
    texts = [f"totally unique document number {i} " + " ".join(
        f"tok{i}_{j}" for j in range(30)) for i in range(6)]
    op = OPERATORS.get("document_minhash_deduplicator")(
        id_key="id", num_permutations=128, jaccard_threshold=0.7
    )
    assert kept(op.apply(make_df(spark, texts))) == [0, 1, 2, 3, 4, 5]


def test_simhash_dedup(spark):
    # simhash (hamming<=4) only catches VERY near dups — a single word
    # tweak; the word-split pair above is hamming≈6 and must survive
    very_near = LONG_A.replace("datasets.", "datasets")
    df = make_df(spark, [LONG_A, very_near, SHORT_B, LONG_A_NEAR])
    op = OPERATORS.get("document_simhash_deduplicator")(id_key="id")
    assert kept(op.apply(df)) == [0, 2, 3]


def test_ngram_jaccard_dedup(spark):
    df = make_df(spark, [LONG_A, LONG_A_NEAR, SHORT_B, SHORT_C])
    op = OPERATORS.get("ngram_jaccard_deduplicator")(id_key="id", threshold=0.5)
    assert kept(op.apply(df)) == [0, 2, 3]


def test_connected_components_chain(spark):
    # chain 1-2-3-4 plus isolated pair 10-11: two components
    edges = spark.createDataFrame(
        [(2, 1), (3, 2), (4, 3), (11, 10)], ["src", "dst"]
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_exact_dedup_hash_methods(spark):
    """hash_method md5/sha1/sha256 (ray_document_deduplicator parity) —
    identical keep decisions, different hash spaces."""
    df = make_df(spark, ["same text", "same text", "other"])
    for method in ("md5", "sha1", "sha256"):
        op = OPERATORS.get("document_deduplicator")(
            id_key="id", hash_method=method)
        assert kept(op.apply(df)) == [0, 2], method
