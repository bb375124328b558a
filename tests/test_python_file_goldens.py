"""python_file_mapper reference-golden parity
(tests/ops/mapper/test_python_file_mapper.py:9-109): file/function
construction validation and sample-dict transform results. The source
is exec'd on executors, so functions work under spark-submit too.
"""

from __future__ import annotations

import pytest

import data_juicer_spark.operators  # noqa: F401
from data_juicer_spark.registry import OPERATORS

OP = "python_file_mapper"


def _write(tmp_path, body, name="user_fn.py"):
    p = tmp_path / name
    p.write_text(body)
    return str(p)


def test_function_execution(spark, tmp_path):
    path = _write(tmp_path,
                  "def process_data(sample):\n"
                  "    return {'value': sample['value'] + 10}\n")
    op = OPERATORS.get(OP)(file_path=path, function_name="process_data")
    df = spark.createDataFrame([(5,)], "value long")
    assert op.apply(df).first()["value"] == 15


def test_function_batched(spark, tmp_path):
    path = _write(tmp_path,
                  "def process_data(samples):\n"
                  "    return {'value': [v * 10 for v in samples['value']]}\n")
    op = OPERATORS.get(OP)(file_path=path, function_name="process_data",
                           batched=True)
    df = spark.createDataFrame([(5,), (7,)], "value long")
    got = sorted(r["value"] for r in op.apply(df).collect())
    assert got == [50, 70]


def test_function_with_import(spark, tmp_path):
    path = _write(tmp_path,
                  "import numpy as np\n"
                  "def process_data(sample):\n"
                  "    return {'value': int(np.sum([sample['value'], 10]))}\n")
    op = OPERATORS.get(OP)(file_path=path, function_name="process_data")
    df = spark.createDataFrame([(5,)], "value long")
    assert op.apply(df).first()["value"] == 15


def test_identity_default(spark):
    df = spark.createDataFrame([("x",)], "text string")
    op = OPERATORS.get(OP)()
    assert op.apply(df).first()["text"] == "x"


def test_file_not_found():
    with pytest.raises(FileNotFoundError, match="does not exist"):
        OPERATORS.get(OP)(file_path="non_existent.py",
                          function_name="process_data")


def test_file_not_python_extension(tmp_path):
    path = _write(tmp_path, "This is a text file.", name="notes.txt")
    with pytest.raises(ValueError, match="is not a Python file"):
        OPERATORS.get(OP)(file_path=path, function_name="some_function")


def test_function_not_found(tmp_path):
    path = _write(tmp_path,
                  "def existing_function(sample):\n    return sample\n")
    with pytest.raises(ValueError, match="not found"):
        OPERATORS.get(OP)(file_path=path,
                          function_name="non_existing_function")


def test_function_not_callable(tmp_path):
    path = _write(tmp_path, "x = 42\n")
    with pytest.raises(ValueError, match="not callable"):
        OPERATORS.get(OP)(file_path=path, function_name="x")


def test_function_multiple_arguments(tmp_path):
    path = _write(tmp_path,
                  "def multi_arg_function(arg1, arg2):\n"
                  "    return arg1 + arg2\n")
    with pytest.raises(ValueError, match="must take exactly one argument"):
        OPERATORS.get(OP)(file_path=path, function_name="multi_arg_function")


def test_invalid_return_type(spark, tmp_path):
    path = _write(tmp_path,
                  "def invalid_function(sample):\n"
                  "    return sample['value'] + 5\n")
    op = OPERATORS.get(OP)(file_path=path, function_name="invalid_function")
    df = spark.createDataFrame([(5,)], "value long")
    with pytest.raises(Exception,
                       match="Function must return a dictionary, got int"):
        op.apply(df).collect()
