"""Reference unit-test golden fixtures, ported wholesale.

tests/fixtures_reference_goldens.json is machine-extracted from
/root/reference/tests/ops/{filter,mapper,deduplicator}/test_*.py
(ds_list/tgt_list/op-kwargs per `_run_*` call). Every case runs through
OUR operator and must reproduce the reference's expected output exactly
— the broadest direct parity evidence in the repo (69 cases across 24
ops). Known deviations are XFAILed with the dependency that causes them,
never skipped silently.
"""

import json
import os

import pytest

import data_juicer_spark.operators  # noqa: F401
from data_juicer_spark.registry import OPERATORS

FIXTURE = os.path.join(os.path.dirname(__file__),
                       "fixtures_reference_goldens.json")
CASES = []
for _op, _cases in json.load(open(FIXTURE)).items():
    for _i, _c in enumerate(_cases):
        CASES.append(pytest.param(_op, _c, id=f"{_op}#{_i}:{_c['method']}"))

# documented deviations: per-language (sentencepiece/jieba-style)
# tokenization is a model dependency the hermetic build does not ship
XFAIL = {
    ("words_num_filter", "test_zh_case"),
    ("word_repetition_filter", "test_zh_case"),
    ("remove_words_with_incorrect_substrings_mapper", "test_zh_case"),
}


@pytest.mark.parametrize("opname,case", CASES)
def test_reference_golden(spark, opname, case):
    if (opname, case["method"]) in XFAIL:
        pytest.xfail("per-language tokenization is a model dep "
                     "(sentencepiece/jieba) — documented deviation")
    kwargs = dict(case["kwargs"])
    if opname == "document_deduplicator":
        kwargs["id_key"] = "id"
    op = OPERATORS.get(opname)(**kwargs)
    df = spark.createDataFrame(
        [(j, t) for j, t in enumerate(case["ds"])], "id long, text string")
    got = [r["text"] for r in op.apply(df).orderBy("id").collect()]
    assert got == case["tgt"]
