"""Analyzer / Tracer / DatasetBuilder / Exporter / selectors-groupers."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

import data_juicer_spark.operators  # noqa: F401
from data_juicer_spark.analysis import Analyzer, Tracer
from data_juicer_spark.registry import OPERATORS
from data_juicer_spark.sources import DatasetBuilder, Exporter


@pytest.fixture()
def tmpd():
    d = tempfile.mkdtemp(prefix="aio_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_analyzer_overall(spark, docs):
    an = Analyzer([
        {"text_length_filter": {"min_len": 0, "text_key": "text"}},
        {"words_num_filter": {"min_num": 0, "text_key": "text"}},
    ])
    out = {r["stat"]: r for r in an.overall(docs).collect()}
    assert set(out) == {"text_len", "num_words"}
    assert out["text_len"]["count"] == docs.count()
    # text_len mean must equal the avg of n_chars (generator invariant)
    expect = docs.agg(F.round(F.avg(F.length("text")), 6)).collect()[0][0]
    assert out["text_len"]["mean"] == pytest.approx(expect, abs=1e-6)
    assert out["text_len"]["min"] <= out["text_len"]["p50"] <= out["text_len"]["max"]


def test_analyzer_hist(spark, docs):
    an = Analyzer([{"text_length_filter": {"min_len": 0, "text_key": "text"}}])
    hist = an.column_wise_hist(docs, "text_len", bins=10)
    assert sum(c for _, c in hist) == docs.count()


def test_tracer(spark, docs, tmpd):
    tracer = Tracer(tmpd, show_num=5)
    op = OPERATORS.get("text_length_filter")(min_len=100, max_len=10**9, text_key="text")
    after = op.apply(docs)
    p = tracer.trace_filter("text_length_filter", docs, after, key="doc_id")
    assert os.path.exists(p)
    with open(p) as f:
        lines = [ln for ln in f.read().splitlines() if ln]
    assert 0 < len(lines) <= 5

    mop = OPERATORS.get("replace_content_mapper")(pattern="spark", repl="SPARK", text_key="text")
    p2 = tracer.trace_mapper("replace", docs, mop.apply(docs), key="doc_id", text_key="text")
    with open(p2) as f:
        assert "SPARK" in f.read()


def test_dataset_builder_mixture(spark, tmpd):
    a = spark.createDataFrame([(i, "a") for i in range(100)], ["id", "src"])
    b = spark.createDataFrame([(i, "b") for i in range(100)], ["id", "src"])
    a.write.parquet(f"{tmpd}/a.parquet")
    b.write.parquet(f"{tmpd}/b.parquet")
    builder = DatasetBuilder(spark)
    out = builder.load([
        {"path": f"{tmpd}/a.parquet", "weight": 2.0},
        {"path": f"{tmpd}/b.parquet", "weight": 0.5},
    ])
    counts = {r["src"]: r["cnt"] for r in
              out.groupBy("src").agg(F.count("*").alias("cnt")).collect()}
    assert counts["a"] == 200          # duplicated 2x
    assert 20 <= counts["b"] <= 80     # ~50% sample


def test_parse_cli_datapath():
    cfg = DatasetBuilder.parse_cli_datapath("0.5 a.jsonl 2 b_dir c.parquet")
    assert cfg == [
        {"path": "a.jsonl", "weight": 0.5},
        {"path": "b_dir", "weight": 2.0},
        {"path": "c.parquet", "weight": 1.0},
    ]


def test_exporter_roundtrip(spark, tmpd):
    df = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "text"])
    Exporter.export(df, f"{tmpd}/out_json", fmt="jsonl", num_shards=1)
    back = spark.read.json(f"{tmpd}/out_json")
    assert sorted((r["id"], r["text"]) for r in back.collect()) == [(1, "x"), (2, "y")]


def test_text_formats(spark, tmpd):
    with open(f"{tmpd}/doc.txt", "w") as f:
        f.write("line one\nline two\n")
    out = DatasetBuilder(spark).load([f"{tmpd}/doc.txt"])
    assert out.columns == ["text"] and out.count() == 2


def test_selector_topk_and_range(spark, docs):
    top = OPERATORS.get("topk_specified_field_selector")(
        field_key="n_chars", topk=5, id_key="doc_id"
    ).apply(docs)
    vals = [r["n_chars"] for r in top.collect()]
    mx = docs.agg(F.max("n_chars")).collect()[0][0]
    assert max(vals) == mx and len(vals) == 5


def test_grouper_roundtrip(spark):
    df = spark.createDataFrame(
        [(0, "a", "t0"), (1, "a", "t1"), (2, "b", "t2")], ["id", "k", "text"]
    )
    grouped = OPERATORS.get("key_value_grouper")(
        group_by_keys=["k"], id_key="id"
    ).apply(df)
    back = OPERATORS.get("naive_reverse_grouper")().apply(grouped)
    assert sorted((r["id"], r["k"], r["text"]) for r in back.collect()) == \
        [(0, "a", "t0"), (1, "a", "t1"), (2, "b", "t2")]


def test_tsv_extension_maps_to_tab_separator(spark, tmpd):
    """ADVICE fix: a .tsv file must load via the tab-separator branch by
    extension inference alone."""
    import os

    from data_juicer_spark.sources.builder import DatasetBuilder

    p = os.path.join(tmpd, "data.tsv")
    with open(p, "w") as f:
        f.write("doc_id\ttext\n1\thello world\n2\tsecond row\n")
    df = DatasetBuilder(spark).load([p])
    assert df.columns == ["doc_id", "text"]
    assert df.count() == 2
    assert {r["text"] for r in df.collect()} == {"hello world", "second row"}


def test_analyzer_correlation(spark, docs):
    from data_juicer_spark.analysis.analyzer import Analyzer

    an = Analyzer([
        {"text_length_filter": {"text_key": "text"}},
        {"words_num_filter": {"text_key": "text"}},
    ])
    rows = an.correlation(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["stat_a"], r["stat_b"]) == ("text_len", "num_words")
    assert 0.8 < r["corr"] <= 1.0  # length and word count strongly correlate


def test_analyzer_insight_mining(spark, docs):
    """Distribution-shift detection: a length filter shifts mean text_len
    up significantly; an identity 'shift' is not significant."""
    from data_juicer_spark.analysis.analyzer import Analyzer
    from pyspark.sql import functions as F

    an = Analyzer([{"text_length_filter": {"text_key": "text"}}])
    after = docs.where(F.length("text") > 200)
    shifted = {r["stat"]: r for r in an.insight_mining(docs, after).collect()}
    assert shifted["text_len"]["significant"] is True
    assert shifted["text_len"]["mean_after"] > shifted["text_len"]["mean_before"]
    same = {r["stat"]: r for r in an.insight_mining(docs, docs).collect()}
    assert same["text_len"]["significant"] is False
    assert abs(same["text_len"]["welch_t"]) < 1e-9


def test_webdataset_roundtrip(spark, tmpd):
    """webdataset tar shards: stdlib-tar reader over binaryFile scans and
    the matching sharded writer (reference Ray datasource parity)."""
    import io
    import os
    import tarfile

    from data_juicer_spark.sources.webdataset import (
        read_webdataset, write_webdataset,
    )

    src = os.path.join(tmpd, "wds")
    os.makedirs(src)
    with tarfile.open(os.path.join(src, "shard-000.tar"), "w") as tf:
        for key, txt, blob in [("s1", "hello", b"\x00\x01"),
                               ("s2", "world", b"\xff")]:
            for ext, data in (("txt", txt.encode()), ("bin", blob)):
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        info = tarfile.TarInfo(name="s3.txt")  # sample missing the bin member
        info.size = 4
        tf.addfile(info, io.BytesIO(b"solo"))

    df = read_webdataset(spark, f"{src}/*.tar",
                         {"txt": "string", "bin": "binary"})
    rows = {r["sample_key"]: (r["txt"], bytes(r["bin"]) if r["bin"] else None)
            for r in df.collect()}
    assert rows == {"s1": ("hello", b"\x00\x01"),
                    "s2": ("world", b"\xff"), "s3": ("solo", None)}

    out = os.path.join(tmpd, "wds_out")
    n = write_webdataset(df, out, {"txt": "string", "bin": "binary"},
                         num_shards=2)
    assert n == 3
    back = read_webdataset(spark, f"{out}/*.tar",
                           {"txt": "string", "bin": "binary"})
    got = {r["sample_key"]: r["txt"] for r in back.collect()}
    assert got == {"s1": "hello", "s2": "world", "s3": "solo"}


def test_dj_process_cli_roundtrip(spark, tmpd):
    """dj-process mirror: YAML recipe → load → pipeline → export, with
    per-op row counts (the reference's main lifecycle, SURVEY §3.1)."""
    import json
    import os
    import sys

    import yaml

    sys.path.insert(0, "/root/repo/tools")
    import dj_process

    cfg = {
        "dataset_path": "/root/testdata/sf0.001/documents.parquet",
        "export_path": os.path.join(tmpd, "out"),
        "export_format": "parquet",
        "text_key": "text",
        "process": [
            {"whitespace_normalization_mapper": {}},
            {"text_length_filter": {"min_len": 100, "max_len": 10**9}},
        ],
    }
    cfg_path = os.path.join(tmpd, "recipe.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    res = dj_process.run(cfg_path, op_stats=True)
    assert res["ops"] == 2
    out = spark.read.parquet(cfg["export_path"])
    # oracle mirrors the pipeline: the whitespace mapper trims first and
    # maps whitespace 1:1, so post-pipeline length == length(trim(text))
    exp = spark.read.parquet(cfg["dataset_path"]) \
        .where("length(trim(text)) >= 100").count()
    assert out.count() == exp
    stats = res["op_stats"]
    assert stats["zz_out"] == exp  # observe() counts rode the write


def test_dj_analyze_cli(spark, tmpd):
    import sys

    import yaml

    sys.path.insert(0, "/root/repo/tools")
    import dj_analyze

    cfg = {
        "dataset_path": "/root/testdata/sf0.001/documents.parquet",
        "process": [
            {"text_length_filter": {"text_key": "text"}},
            {"words_num_filter": {"text_key": "text"}},
        ],
    }
    import os
    cfg_path = os.path.join(tmpd, "an.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    res = dj_analyze.run(cfg_path, out_dir=os.path.join(tmpd, "an_out"))
    assert set(res["stats"]) == {"text_len", "num_words"}
    assert res["n_correlations"] == 1


def test_empty_formatter(spark):
    from data_juicer_spark.sources.builder import DatasetBuilder

    df = DatasetBuilder(spark).load([{"format": "empty", "length": 7}])
    assert df.count() == 7
    assert df.columns == ["sample_id", "text"]
    assert all(r["text"] is None for r in df.collect())


def test_tfrecord_roundtrip_and_crc(spark, tmpd):
    """TFRecord container framing (length + masked CRC32C + payload):
    sharded write → binaryFile read, CRC validation on, hand-framed
    golden record readable, corruption detected."""
    import os
    import struct

    from data_juicer_spark.sources.tfrecord import (
        _masked_crc, read_tfrecord, write_tfrecord,
    )

    recs = [b"alpha", b"", b"\x00\xffbinary\x01" * 100]
    df = spark.createDataFrame([(bytearray(r),) for r in recs],
                               "record binary")
    out = os.path.join(tmpd, "tfr")
    assert write_tfrecord(df, out, num_shards=2) == 3

    back = read_tfrecord(spark, f"{out}/*.tfrecord", verify_crc=True)
    got = sorted(bytes(r["record"]) for r in back.collect())
    assert got == sorted(recs)
    # per-shard record index is dense from 0
    idx = [(r["shard"], r["idx"]) for r in back.collect()]
    assert all(i >= 0 for _, i in idx)

    # hand-framed golden record (independent of the writer)
    gold_dir = os.path.join(tmpd, "tfr_gold")
    os.makedirs(gold_dir)
    data = b"golden"
    header = struct.pack("<Q", len(data))
    with open(os.path.join(gold_dir, "g.tfrecord"), "wb") as fh:
        fh.write(header + struct.pack("<I", _masked_crc(header))
                 + data + struct.pack("<I", _masked_crc(data)))
    rows = read_tfrecord(spark, f"{gold_dir}/*.tfrecord",
                         verify_crc=True).collect()
    assert [bytes(r["record"]) for r in rows] == [b"golden"]

    # corruption: flip a payload byte → CRC failure surfaces
    bad_dir = os.path.join(tmpd, "tfr_bad")
    os.makedirs(bad_dir)
    framed = (header + struct.pack("<I", _masked_crc(header))
              + b"goldeX" + struct.pack("<I", _masked_crc(data)))
    with open(os.path.join(bad_dir, "b.tfrecord"), "wb") as fh:
        fh.write(framed)
    import pytest as _pytest
    with _pytest.raises(Exception, match="CRC mismatch"):
        read_tfrecord(spark, f"{bad_dir}/*.tfrecord",
                      verify_crc=True).collect()


def test_tfrecord_builder_exporter_routing(spark, tmpd):
    import os

    from data_juicer_spark.sources.builder import DatasetBuilder, Exporter

    df = spark.createDataFrame([(bytearray(b"r1"),), (bytearray(b"r2"),)],
                               "record binary")
    out = os.path.join(tmpd, "tfr_route")
    Exporter.export(df, out, fmt="tfrecord", num_shards=1)
    back = DatasetBuilder(spark).load(
        [{"path": f"{out}/*.tfrecord", "format": "tfrecord"}])
    assert sorted(bytes(r["record"]) for r in back.collect()) == [b"r1", b"r2"]
