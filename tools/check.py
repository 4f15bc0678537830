#!/usr/bin/env python3
"""Dev-only mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sf_dir] [verify_out_dir]

Loads each parquet table from sf_dir into DuckDB, runs every oracle SQL from
verify_out_dir/oracle_sql.json, and strictly compares against the parquet the
Spark Verify main dumped: column names (sorted), row counts, and exact values
(doubles compared bit-exact after canonicalization). NOT part of the shipped
library — this is the pre-flight for `graft.Verify`.
"""
import glob
import json
import math
import os
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(canon(r[c]) for c in cols) for _, r in df.iterrows()]
    return cols, rows


def main():
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{SF_DIR}/*.parquet")):
        name = os.path.basename(p).removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    with open(f"{OUT_DIR}/oracle_sql.json") as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = f"{OUT_DIR}/{name}"
        status, detail = "PASS", ""
        try:
            if not os.path.isdir(spark_dir):
                raise RuntimeError("spark output missing")
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
            # Driver-fidelity probe: the real checker pandas-sorts result
            # frames by every column before hashing; array-typed cells make
            # that die with "unhashable type: numpy.ndarray" (the t18/round-3
            # failure class). Reproduce the sort here so it fails LOCALLY.
            try:
                got.sort_values(by=list(got.columns))
            except Exception as e:  # noqa: BLE001
                raise RuntimeError(
                    f"result not pandas-sortable (driver would err): {e}")
            want = con.execute(sql).df()
            gc, gr = frame_rows(got)
            wc, wr = frame_rows(want)
            if gc != wc:
                raise RuntimeError(f"columns differ: spark={gc} oracle={wc}")
            if len(gr) != len(wr):
                raise RuntimeError(f"rowcount {len(gr)} vs {len(wr)}")
            mism = [(i, a, b) for i, (a, b) in enumerate(zip(gr, wr)) if a != b]
            if mism:
                i, a, b = mism[0]
                raise RuntimeError(
                    f"{len(mism)} mismatched rows; first at {i}:\n"
                    f"  spark : {a}\n  oracle: {b}\n  cols  : {gc}")
        except Exception as e:  # noqa: BLE001
            status, detail = "FAIL", str(e)
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        print(f"[{status}] {name}" + (f"\n  {detail}" if detail else ""))

    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
