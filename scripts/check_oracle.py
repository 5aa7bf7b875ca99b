#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

<verifyOutDir> is what `graft.Verify <sfDir> <verifyOutDir>` wrote: one
parquet dir per query + oracle_sql.json. For each query we run the oracle
SQL in DuckDB over the same parquet tables, then compare: column names
(sorted), row count, and cell values (rows sorted; floats to 1e-9 rel).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    # floats compare EXACTLY (no tolerance): the driver may hash raw values,
    # so any last-ulp divergence must surface here, not there.
    # int and float are TAGGED as distinct (round 12): the driver's pandas
    # path turns DuckDB HUGEINT (= any uncast sum(BIGINT)) into float64 and
    # hashes it unlike Spark's int64 — that dtype drift was r11's only
    # hash-red row, and fetchall()'s exact Python ints masked it here.
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            # the DRIVER's pandas sort_values crashes on ndarray cells
            # (unhashable) — tuple-izing here masked exactly that failure
            # for q_image_stats in round 14. Mirror the driver: array
            # columns are a hard error; emit a canonical scalar instead.
            raise TypeError(
                "array-typed result cell — the driver's gate cannot compare "
                "this; flatten it to a scalar column (e.g. array_join)")
        if isinstance(v, np.integer):
            return ("i", int(v))
        if isinstance(v, np.floating):
            v = float(v)
    except ImportError:
        pass
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return ("f", "NaN" if math.isnan(v) else v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            # fetch BOTH sides through pandas (.df()), like the driver does:
            # dtype drift (HUGEINT→float64, arrays→ndarray) must surface here
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            got_cols = list(got.columns)
            got_rows = list(got.itertuples(index=False, name=None))
            want = con.execute(sql).df()
            want_cols = list(want.columns)
            want_rows = list(want.itertuples(index=False, name=None))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        try:
            gc, gr = norm_rows(got_cols, got_rows)
            wc, wr = norm_rows(want_cols, want_rows)
        except TypeError as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
        elif len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
            n_fail += 1
        elif gr != wr:
            bad = next(i for i, (a, b) in enumerate(zip(gr, wr)) if a != b)
            print(f"FAIL {name}: first differing row #{bad}:\n  spark={gr[bad]}\n  duck ={wr[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
