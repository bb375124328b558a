"""Environment-proofing fence for events_sessionize (driver-red rounds
1-3 despite local IEEE-bit parity): the query must produce identical
results under ANY driver-supplied session configuration. The rewrite
guarantees this structurally — NTZ-minus-NTZ interval gap math (no
session-zoned cast, no epoch()), and a BIGINT-only output row (no float
canonicalization path at all). These tests pin both properties plus a
live DuckDB cross-check under a hostile session timezone."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import types as T

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _vhash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join("NULL" if r[i] is None else str(r[i]) for i in order)
        for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def test_output_row_has_no_float_columns(spark):
    df = entrymod.queries()["events_sessionize"](spark, SF)
    floaty = [f.name for f in df.schema.fields
              if isinstance(f.dataType, (T.DoubleType, T.FloatType))]
    assert not floaty, (
        f"events_sessionize regained float output column(s) {floaty} — "
        "the row must stay BIGINT-only (see round-3 VERDICT item 1)")


def test_oracle_has_no_epoch_or_double_division():
    sql = entrymod.oracle_sql()["events_sessionize"]
    assert "epoch(" not in sql, (
        "oracle regained epoch() — older DuckDB versions return truncated "
        "BIGINT seconds from epoch(), which diverges from Spark's "
        "fractional gap on boundary rows; use interval comparison instead")
    assert "1000000.0" not in sql, "oracle regained a double division"


@pytest.mark.parametrize("tz", ["America/New_York", "Asia/Shanghai"])
def test_matches_duckdb_under_hostile_session_timezone(spark, tz):
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", tz)
        df = entrymod.queries()["events_sessionize"](spark, SF)
        srows = [tuple(r) for r in df.collect()]
        scols = df.columns
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')")
    res = con.execute(entrymod.oracle_sql()["events_sessionize"])
    orows = res.fetchall()
    ocols = [d[0] for d in res.description]

    assert len(srows) == len(orows)
    assert sorted(scols) == sorted(ocols)
    assert _vhash(srows, scols) == _vhash(orows, ocols)


def test_building_query_does_not_leak_session_timezone(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        entrymod.queries()["events_sessionize"](spark, SF)
        assert spark.conf.get("spark.sql.session.timeZone") == "Asia/Tokyo"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
