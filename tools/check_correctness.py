"""Local mirror of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count + order-insensitive value hash (columns sorted by name).

The oracle side is fetched through Arrow (fetch_arrow_table), NOT
fetchall(): fetchall() converts DuckDB HUGEINT/DECIMAL to plain Python
ints, type-erasing exactly the divergence class that kept
events_sessionize driver-red for four rounds while this mirror reported
PASS.  Arrow preserves the physical output type (HUGEINT →
decimal128(38,0), which stringifies/hashes differently from int64), so
local green now predicts driver green on that axis.  A physical-type
fence additionally rejects any oracle output column whose Arrow type is
outside {int64, float64, string, bool}.
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from data_juicer_spark import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


# Arrow types a well-formed oracle may emit (matches what Spark's
# collect() yields for bigint/double/string/boolean outputs).  Anything
# else — decimal128 from HUGEINT sums, date32, timestamp — would hash
# differently in a typed driver fetch path and must be CAST in the SQL.
# int32 allowed: Spark emits IntegerType for row_number() etc. and the
# matching oracles CAST to INT deliberately (exact-match fence lives in
# tests/test_oracle_type_fence.py).
ALLOWED_ARROW = {"int32", "int64", "double", "string", "large_string",
                 "bool"}


def fetch_oracle_arrow(con, sql):
    """Run an oracle and return (colnames, rows, bad_types).

    rows come from the Arrow table (not fetchall) so physical-type
    divergences like HUGEINT→Decimal survive into the value hash;
    bad_types lists any column whose Arrow type is outside ALLOWED_ARROW.
    """
    tbl = con.execute(sql).fetch_arrow_table()
    cols = tbl.column_names
    bad = [
        f"{f.name}:{f.type}" for f in tbl.schema
        if str(f.type) not in ALLOWED_ARROW
    ]
    pycols = [tbl.column(c).to_pylist() for c in cols]
    rows = list(zip(*pycols)) if cols else []
    return cols, rows, bad


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    spark = get_spark(parallelism=16)
    if os.environ.get("MIRROR_HOSTILE"):
        # simulate an adversarial grading-driver session: non-UTC
        # timezone + odd shuffle partitioning. Every oracle row must
        # stay green — this is the guard against the sessionize-class
        # environment-sensitivity bug (driver-red r1-r3)
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        spark.conf.set("spark.sql.shuffle.partitions", "7")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    passed = failed = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failed += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows")
            continue
        try:
            dcols, drows, bad_types = fetch_oracle_arrow(con, oracles[name])
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            failed += 1
            continue
        if bad_types:
            # str(Decimal('42')) == '42' so the value hash alone cannot
            # see this class — the type fence is the hard gate.
            print(f"FAIL {name}: oracle Arrow type outside fence: {bad_types}")
            failed += 1
            continue
        ok_count = len(srows) == len(drows)
        ok_schema = sorted(scols) == sorted(dcols)
        sh = value_hash([tuple(r) for r in srows], scols)
        dh = value_hash(drows, dcols)
        ok_hash = sh == dh
        if ok_count and ok_schema and ok_hash:
            print(f"PASS {name}: {len(srows)} rows")
            passed += 1
        else:
            print(
                f"FAIL {name}: count {len(srows)} vs {len(drows)}, "
                f"schema {scols} vs {dcols}, hash {'ok' if ok_hash else 'MISMATCH'}"
            )
            failed += 1
    print(f"\n{passed} passed, {failed} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
