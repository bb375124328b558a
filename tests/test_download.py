"""download_file_mapper — distributed fetch plumbing (reference
mapper/download_file_mapper.py). No network in this container, so local
paths and file:// URLs exercise the full path: bytes-into-column,
save-to-dir with atomic writes, resume skip, and per-row failure
isolation."""

from __future__ import annotations

import os

import data_juicer_spark.operators  # noqa: F401
from data_juicer_spark.registry import OPERATORS


def _mk_files(tmp_path, n=3):
    paths = []
    for i in range(n):
        p = tmp_path / f"blob{i}.bin"
        p.write_bytes(f"payload-{i}".encode() * (i + 1))
        paths.append(str(p))
    return paths


def test_download_bytes_into_default_field(spark, tmp_path):
    paths = _mk_files(tmp_path)
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(paths)], "id long, url string")
    op = OPERATORS.get("download_file_mapper")(download_field="url")
    out = {r["id"]: r for r in op.apply(df).collect()}
    for i, p in enumerate(paths):
        assert out[i]["url_status"] == "success"
        assert bytes(out[i]["image_bytes"]) == open(p, "rb").read()


def test_download_file_url_and_save_dir(spark, tmp_path):
    paths = _mk_files(tmp_path, 2)
    dest = str(tmp_path / "dest")
    df = spark.createDataFrame(
        [(0, "file://" + paths[0]), (1, paths[1])], "id long, url string")
    op = OPERATORS.get("download_file_mapper")(
        download_field="url", save_dir=dest, save_field="data")
    rows = {r["id"]: r for r in op.apply(df).collect()}
    for i in (0, 1):
        assert rows[i]["url_status"] == "success"
        assert os.path.exists(rows[i]["url_path"])
        assert open(rows[i]["url_path"], "rb").read() == bytes(rows[i]["data"])


def test_download_failure_is_row_isolated(spark, tmp_path):
    ok = _mk_files(tmp_path, 1)[0]
    df = spark.createDataFrame(
        [(0, ok), (1, str(tmp_path / "missing.bin")), (2, "")],
        "id long, url string")
    op = OPERATORS.get("download_file_mapper")(download_field="url")
    rows = {r["id"]: r for r in op.apply(df).collect()}
    assert rows[0]["url_status"] == "success"
    assert rows[1]["url_status"] == "failed"
    assert "FileNotFoundError" in rows[1]["url_error"]
    assert rows[2]["url_status"] == "failed"
    assert len(rows) == 3  # failures never drop or kill rows


def test_download_resume_skips_existing(spark, tmp_path):
    src = _mk_files(tmp_path, 1)[0]
    dest = str(tmp_path / "dest2")
    os.makedirs(dest)
    pre = os.path.join(dest, os.path.basename(src))
    with open(pre, "wb") as f:
        f.write(b"already-here")
    df = spark.createDataFrame([(0, src)], "id long, url string")
    op = OPERATORS.get("download_file_mapper")(
        download_field="url", save_dir=dest, save_field="data",
        resume_download=True)
    [row] = op.apply(df).collect()
    assert row["url_status"] == "success"
    assert bytes(row["data"]) == b"already-here"  # skipped, not re-fetched
