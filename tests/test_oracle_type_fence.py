"""Oracle physical-type fence (r4 verdict item 2).

The driver's correctness hash is sensitive to the DuckDB oracle's
physical OUTPUT type, not just its values: sum(INTEGER) yields HUGEINT
(int128), which materializes as decimal128(38,0) via Arrow and float64
via pandas — '42.0' vs Spark's int64 '42' — producing the exact
rows_match:true / schema_match:true / hash_match:false signature that
kept events_sessionize red for four rounds.  str(Decimal('42')) == '42'
so a value hash via fetchall() can never see this class; the only
reliable guard is a static type fence on the oracle's Arrow schema.

Two assertions per oracle, run at sf0.001 (full execution, small data):
  1. every output column's Arrow type ∈ {int64, float64, string, bool}
  2. each column's type KIND (int/float/str/bool) equals the Spark
     query's schema kind for the same column name (analysis-only — no
     Spark job runs, so the sweep over all ~84 oracles stays fast).
"""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# int32 is allowed because Spark itself emits IntegerType for e.g.
# row_number(); what matters is that the oracle's physical type EXACTLY
# matches the Spark query's (the second test below).  decimal128,
# date32, timestamp etc. are categorically out: no Spark query here
# emits them, so their presence always means an uncast DuckDB quirk.
ALLOWED_ARROW = {"int32", "int64", "double", "string", "large_string",
                 "bool"}

# Spark simpleString → acceptable Arrow type(s) for the oracle column.
SPARK_TO_ARROW = {
    "int": {"int32"},
    "bigint": {"int64"},
    "double": {"double"},
    "string": {"string", "large_string"},
    "boolean": {"bool"},
}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _oracle_names():
    return sorted(entrymod.oracle_sql().keys())


_SCHEMA_CACHE = {}


def _oracle_schema(con, name):
    """Arrow schema of an oracle's output, executed once per module."""
    if name not in _SCHEMA_CACHE:
        sql = entrymod.oracle_sql()[name]
        _SCHEMA_CACHE[name] = con.execute(sql).fetch_arrow_table().schema
    return _SCHEMA_CACHE[name]


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_arrow_types_in_fence(duck, name):
    schema = _oracle_schema(duck, name)
    bad = [f"{f.name}:{f.type}" for f in schema
           if str(f.type) not in ALLOWED_ARROW]
    assert not bad, (
        f"oracle '{name}' emits Arrow type(s) outside the fence {bad} — "
        f"CAST the column in the SQL (e.g. HUGEINT sums → CAST(... AS "
        f"BIGINT)); see events_sessionize r1-r4 driver-red history"
    )


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_type_matches_spark_schema(duck, spark, name):
    schema = _oracle_schema(duck, name)
    oracle_types = {f.name: str(f.type) for f in schema}

    sdf = entrymod.queries()[name](spark, SF_DIR)
    spark_types = dict(sdf.dtypes)  # analysis only, no job

    assert sorted(oracle_types) == sorted(spark_types), (
        f"column-name mismatch for '{name}': "
        f"oracle {sorted(oracle_types)} vs spark {sorted(spark_types)}"
    )
    mismatched = {
        c: (sdt, oracle_types[c])
        for c, sdt in spark_types.items()
        if oracle_types[c] not in SPARK_TO_ARROW.get(sdt, {sdt})
    }
    assert not mismatched, (
        f"physical-type mismatch for '{name}' "
        f"(spark dtype, oracle Arrow type): {mismatched} — the driver's "
        f"typed fetch paths hash these differently even when values agree"
    )
