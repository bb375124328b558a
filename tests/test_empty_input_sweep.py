"""Every registered operator must survive an EMPTY input DataFrame
without crashing and without changing its output schema between runs —
the degenerate case every 100 TB pipeline hits (empty partition, fully
filtered micro-batch, empty CDC epoch)."""

from __future__ import annotations

import pytest

import data_juicer_spark.operators  # noqa: F401
from data_juicer_spark.registry import OPERATORS

# ops whose construction needs arguments (field-keyed ops default to
# an empty key, which is a config error by design — supply one)
PARAMS = {
    "image_resize_mapper": {"width": 4, "height": 4},
    "topk_specified_field_selector": {"field_key": "doc_id", "topk": 3},
    "frequency_specified_field_selector": {"field_key": "lang", "topk": 3},
    "range_specified_field_selector": {"field_key": "doc_id"},
    "tags_specified_field_selector": {"field_key": "lang",
                                      "target_tags": ["en"]},
    "specified_field_filter": {"field_key": "lang", "target_value": ["en"]},
    "key_value_grouper": {"group_by_keys": ["lang"]},
    "group_stats_aggregator": {"group_keys": ["lang"],
                               "value_col": "doc_id"},
    "text_pair_similarity_filter": {"first_key": "embedding",
                                    "second_key": "embedding_b"},
}

# ops that collapse N rows to a fixed number of rows by design
# (aggregations produce one row even over empty input)
COLLAPSING = {"naive_grouper", "group_stats_aggregator"}


def _registry_names():
    reg = getattr(OPERATORS, "_registry", None)
    return sorted(reg) if reg is not None else sorted(OPERATORS.names())


@pytest.fixture(scope="module")
def empty_df(spark):
    # superset of the column shapes the operator families consume
    return spark.createDataFrame(
        [],
        "doc_id long, text string, lang string, field string,"
        " tags array<string>, audio binary, image binary, video binary,"
        " embedding array<float>, embedding_b array<float>,"
        " image_meta struct<width:int,height:int,n_channels:int,"
        "format:string,decode_error:string>",
    )


@pytest.mark.parametrize("name", _registry_names())
def test_op_handles_empty_input(spark, empty_df, name):
    try:
        op = OPERATORS.get(name)(**PARAMS.get(name, {}))
    except Exception as e:  # construction must not need a live dataset
        pytest.fail(f"{name} construction failed: {e}")
    try:
        out = op.apply(empty_df)
        n = out.count()
    except Exception as e:
        pytest.fail(f"{name} crashed on empty input: {e}")
    if name not in COLLAPSING:
        assert n == 0, f"{name} fabricated {n} rows from empty input"


@pytest.fixture(scope="module")
def null_row_df(spark):
    from pyspark.sql import Row
    schema = ("doc_id long, text string, lang string, field string,"
              " tags array<string>, audio binary, image binary,"
              " video binary, embedding array<float>,"
              " embedding_b array<float>,"
              " image_meta struct<width:int,height:int,n_channels:int,"
              "format:string,decode_error:string>")
    null_row = (1, None, None, None, None, None, None, None, None, None,
                None)
    real_row = (2, "a real text with several words.", "en", "x",
                ["t"], bytearray(b"\x01\x02" * 50), bytearray(b"img"),
                bytearray(b"vid"), [1.0, 0.0], [0.0, 1.0],
                (4, 4, 3, "fake", None))
    return spark.createDataFrame([null_row, real_row], schema)


@pytest.mark.parametrize("name", _registry_names())
def test_mapper_keeps_null_rows(spark, null_row_df, name):
    """Mappers must not silently DROP a row whose payload is null —
    the engine-wide null contract (filters/dedups/selectors may)."""
    from data_juicer_spark.operators.base import Mapper

    op = OPERATORS.get(name)(**PARAMS.get(name, {}))
    if not isinstance(op, Mapper):
        pytest.skip("not a mapper")
    ids = {r["doc_id"] for r in op.apply(null_row_df).collect()}
    assert 1 in ids, f"{name} dropped the null-payload row"
    assert 2 in ids, f"{name} dropped a real row"


@pytest.fixture(scope="module")
def edge_corpus_df(spark):
    texts = [
        "",                                    # empty
        "   \n\t  ",                           # whitespace only
        "emoji 😀🎉 mixed 中文文本 and عربى",    # multi-script
        "ctrl\x02chars\x00here",               # control bytes
        "w" * 5000,                            # one huge token
        "a.b.C.D. U.S.A. end. Next.",          # dotted edge
        "<table><tr><td>x</td></tr>",          # truncated markup
    ]
    rows = [(i, t, "en", "x", ["t"], bytearray(b"\x01" * 64),
             bytearray(b"i"), bytearray(b"v"), [1.0, 0.0], [0.0, 1.0],
             (4, 4, 3, "fake", None)) for i, t in enumerate(texts)]
    return spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, field string,"
        " tags array<string>, audio binary, image binary, video binary,"
        " embedding array<float>, embedding_b array<float>,"
        " image_meta struct<width:int,height:int,n_channels:int,"
        "format:string,decode_error:string>")


@pytest.mark.parametrize("name", _registry_names())
def test_op_survives_edge_corpus(spark, edge_corpus_df, name):
    """No operator may crash on degenerate text: empty, whitespace-only,
    multi-script, control bytes, one huge token, truncated markup.
    (Dropping rows is fine — filters do; raising is not.)"""
    op = OPERATORS.get(name)(**PARAMS.get(name, {}))
    try:
        op.apply(edge_corpus_df).count()
    except Exception as e:
        pytest.fail(f"{name} crashed on edge corpus: {e}")
