"""Second reference-golden batch: structured-sample op families
(specified/numeric/general-field + suffix filters, the three groupers)
machine-ported from /root/reference/tests/ops/{filter,grouper}/test_*.py
into fixtures_reference_goldens2.json — dict samples with nested meta
structs, exactly as the reference's unit tests construct them.

Known deviations (XFAILed, never silently skipped):
- alphanumeric_filter test_token_case needs the HF tokenizer (model dep).
Stopwords/flagged-words reference tests are NOT ported at all: their
expectations encode the reference's downloadable word lists, which the
hermetic build replaces with compact in-repo ones (documented in
assets/wordlists.py).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

import data_juicer_spark.operators  # noqa: F401
from data_juicer_spark.registry import OPERATORS

FIXTURE = os.path.join(os.path.dirname(__file__),
                       "fixtures_reference_goldens2.json")
XFAIL = {
    ("alphanumeric_filter", "test_token_case"):
        "HF tokenizer is a model dep — hermetic build uses the regex-BPE "
        "proxy (documented deviation)",
}

CASES = []
for _op, _cases in json.load(open(FIXTURE)).items():
    for _i, _c in enumerate(_cases):
        # mark-based xfail: the case still RUNS, so an XPASS surfaces
        # the moment a documented deviation stops deviating
        _marks = ([pytest.mark.xfail(reason=XFAIL[(_op, _c["method"])],
                                     strict=False)]
                  if (_op, _c["method"]) in XFAIL else [])
        CASES.append(pytest.param(_op, _c, marks=_marks,
                                  id=f"{_op}#{_i}:{_c['method']}"))


def _field_specs(samples):
    """Union key set + int/float unification per field path (Spark
    cannot infer a column that mixes Long and Double rows)."""
    keys = {}
    for s in samples:
        for k, v in s.items():
            keys.setdefault(k, []).append(v)
    out = {}
    for k, vals in keys.items():
        sub = [v for v in vals if isinstance(v, dict)]
        if sub:
            out[k] = ("dict", _field_specs(sub))
        elif any(isinstance(v, float) for v in vals):
            out[k] = ("float", None)
        else:
            out[k] = ("plain", None)
    return out


def _normalize(sample, spec):
    from pyspark.sql import Row

    vals = {}
    for k, (kind, sub) in spec.items():
        v = sample.get(k)
        if kind == "dict":
            vals[k] = _normalize(v or {}, sub)
        elif kind == "float" and isinstance(v, int) \
                and not isinstance(v, bool):
            vals[k] = float(v)
        else:
            vals[k] = v
    return Row(**vals)


def _to_df(spark, samples):
    spec = _field_specs(samples)
    rows = [_normalize(dict(s, __id=i), dict(spec, __id=("plain", None)))
            for i, s in enumerate(samples)]
    return spark.createDataFrame(rows)


def _plain(v):
    if hasattr(v, "asDict"):
        return {k: _plain(x) for k, x in v.asDict().items()}
    if isinstance(v, dict):
        return {k: _plain(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_plain(x) for x in v]
    return v


def _subset(row: dict, tgt):
    """Project the collected row onto the keys the reference expects
    (recursively), so engine-side extra columns don't fail the compare."""
    if isinstance(tgt, dict):
        return {k: _subset(row.get(k), tv) for k, tv in tgt.items()}
    return row


@pytest.mark.parametrize("opname,case", CASES)
def test_reference_golden2(spark, opname, case, tmp_path):
    kwargs = dict(case["kwargs"])
    for k, v in kwargs.items():
        if v == "__TMP_EXPORT_PATH__":
            kwargs[k] = str(tmp_path / "batch_meta.jsonl")
    if opname == "suffix_filter" and "__dj__suffix__" in case["ds"][0]:
        # reference samples carry the suffix under Fields.suffix
        kwargs.setdefault("suffix_key", "__dj__suffix__")
    if opname in ("naive_grouper", "key_value_grouper"):
        # collect order must follow dataset order, not the first column
        kwargs.setdefault("id_key", "__id")
    if opname == "naive_reverse_grouper" \
            and "__dj__batch_meta__" in case["ds"][0]:
        kwargs.setdefault("batch_meta_key", "__dj__batch_meta__")
    op = OPERATORS.get(opname)(**kwargs)
    df = _to_df(spark, case["ds"])
    out = op.apply(df)
    if "stats" in out.columns and "stats" not in case["ds"][0]:
        out = out.drop("stats")

    if opname == "key_value_grouper":
        # reference compares each batched row's text list against the
        # per-language target dict (test_key_value_grouper.py:10-15)
        tgt = case["tgt"]
        rows = out.collect()
        assert len(rows) == len(tgt)
        for r in rows:
            lang = r["meta"][0]["language"]
            assert list(r["text"]) == tgt[lang]
        return

    ordered = out
    if "__id" in out.columns and opname != "naive_reverse_grouper":
        # reverse grouper: all exploded rows of one batch share the
        # source __id, and sorting on a tied key is not stable — rely on
        # the explode's natural within-partition order instead
        ordered = out.orderBy("__id")
    rows = [_plain(r.asDict()) for r in ordered.collect()]
    got = [_subset(r, t) for r, t in zip(rows, case["tgt"])] \
        if len(rows) == len(case["tgt"]) else rows
    tgt = case["tgt"]
    if opname == "naive_reverse_grouper" and len(case["ds"]) > 1:
        # multiple batched input rows: cross-group output order is not
        # defined in a distributed engine — compare as multisets
        key = lambda d: json.dumps(d, sort_keys=True, ensure_ascii=False)  # noqa: E731
        got = [_subset(r, tgt[0]) for r in rows]
        assert sorted(map(key, got)) == sorted(map(key, tgt))
    else:
        assert got == tgt

    meta_tgt = case.get("meta_tgt")
    if meta_tgt is not None:
        path = kwargs["batch_meta_export_path"]
        lines = [json.loads(ln) for ln in open(path)]
        key = lambda d: json.dumps(d, sort_keys=True, ensure_ascii=False)  # noqa: E731
        assert sorted(map(key, lines)) == sorted(map(key, meta_tgt))


def test_fixture_covers_expected_ops():
    data = json.load(open(FIXTURE))
    assert set(data) == {
        "specified_field_filter", "specified_numeric_field_filter",
        "general_field_filter", "suffix_filter", "alphanumeric_filter",
        "naive_grouper", "naive_reverse_grouper", "key_value_grouper"}
    assert sum(len(v) for v in data.values()) >= 23
