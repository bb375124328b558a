"""Strict bit-exactness check: compare Spark vs DuckDB outputs with
full-precision float repr (no 9-sig-digit forgiveness), across two
different shuffle layouts. Used to prove that no rounded-double output
remains anywhere a driver-side exact hash could diverge.

Usage: python tools/check_bitexact.py [sf_dir] [q1,q2,...]
"""

from __future__ import annotations

import hashlib
import struct
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from data_juicer_spark import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # exact IEEE bits — zero tolerance
        return struct.pack("<d", v).hex()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def vhash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x01".join(cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = [n for n in qs if n in oracles and (not ONLY or n in ONLY)]

    # Arrow fetch (not fetchall): preserves DuckDB physical output types
    # (HUGEINT→decimal128 etc.) so a type divergence fails here instead
    # of being erased into Python ints — see check_correctness.py.
    duck = {}
    type_fail = 0
    allowed = {"int32", "int64", "double", "string", "large_string",
               "bool"}
    for n in names:
        tbl = con.execute(oracles[n]).fetch_arrow_table()
        bad = [f"{f.name}:{f.type}" for f in tbl.schema
               if str(f.type) not in allowed]
        if bad:
            print(f"TYPEFENCE {n}: oracle Arrow type outside fence: {bad}")
            type_fail += 1
        cols = tbl.column_names
        pycols = [tbl.column(c).to_pylist() for c in cols]
        rows = list(zip(*pycols)) if cols else []
        duck[n] = vhash(rows, cols)

    failed = 0
    for par in (7, 32):
        spark = get_spark(parallelism=par)
        for n in names:
            sdf = qs[n](spark, SF_DIR)
            sh = vhash([tuple(r) for r in sdf.collect()], sdf.columns)
            ok = sh == duck[n]
            print(f"{'BITEXACT' if ok else 'DIVERGED'} par={par} {n}")
            if not ok:
                failed += 1
        spark.stop()
    print(f"\n{failed} diverged, {type_fail} type-fence failures")
    return 1 if (failed or type_fail) else 0


if __name__ == "__main__":
    sys.exit(main())
