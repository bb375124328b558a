"""python_lambda_mapper reference-golden parity
(tests/ops/mapper/test_python_lambda_mapper.py:8-67): string-lambda
construction/validation semantics and sample-dict transform results."""

from __future__ import annotations

import pytest

import data_juicer_spark.operators  # noqa: F401
from data_juicer_spark.registry import OPERATORS

OP = "python_lambda_mapper"


def test_lambda_modifies_values(spark):
    df = spark.createDataFrame([(5,)], "value long")
    op = OPERATORS.get(OP)(lambda_str="lambda d: {'value': d['value'] + 1}")
    assert op.apply(df).first()["value"] == 6


def test_lambda_swaps_values(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    op = OPERATORS.get(OP)(lambda_str="lambda d: {'a': d['b'], 'b': d['a']}")
    row = op.apply(df).first()
    assert (row["a"], row["b"]) == (2, 1)


def test_lambda_batched(spark):
    df = spark.createDataFrame([(5,), (7,)], "value long")
    op = OPERATORS.get(OP)(
        lambda_str="lambda d: {'value': [v * 10 for v in d['value']]}",
        batched=True)
    got = sorted(r["value"] for r in op.apply(df).collect())
    assert got == [50, 70]


def test_lambda_identity_default(spark):
    df = spark.createDataFrame([("x",)], "text string")
    op = OPERATORS.get(OP)()
    assert op.apply(df).first()["text"] == "x"


def test_invalid_syntax():
    with pytest.raises(ValueError, match="Invalid lambda function"):
        OPERATORS.get(OP)(lambda_str="invalid lambda")


def test_not_a_lambda():
    with pytest.raises(ValueError,
                       match="must be a valid lambda function"):
        OPERATORS.get(OP)(lambda_str="3 + 5")


def test_multiple_arguments():
    with pytest.raises(ValueError, match="exactly one argument"):
        OPERATORS.get(OP)(lambda_str="lambda x, y: {'sum': x + y}")


def test_non_dict_result_fails_at_runtime(spark):
    df = spark.createDataFrame([(10,)], "value long")
    op = OPERATORS.get(OP)(lambda_str="lambda d: d['value'] + 1")
    with pytest.raises(Exception, match="must return a dictionary"):
        op.apply(df).collect()


def test_fast_series_mode_still_works(spark):
    df = spark.createDataFrame([(0, "ab")], "id long, text string")
    op = OPERATORS.get(OP)(fn=lambda s: s.str.upper(), text_key="text")
    assert op.apply(df).first()["text"] == "AB"
