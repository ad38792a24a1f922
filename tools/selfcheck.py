#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet in <outDir>, executes the matching
oracle SQL (from oracle_sql.json) in DuckDB over the same sf dir,
sorts columns by name and rows by value, and compares dtypes + values.

Usage: python3 tools/selfcheck.py <sfDir> <outDir>
"""
import json
import sys
import glob
import os

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    # Normalize a cell for comparison (float repr keeps full precision).
    if isinstance(v, float):
        return repr(v)
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_glob = os.path.join(out_dir, name, "*.parquet")
        if not glob.glob(res_glob):
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_glob}')").fetch_arrow_table()
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: query error: {e}")
            n_fail += 1
            continue

        gcols = sorted(got.column_names)
        wcols = sorted(want.column_names)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} != {wcols}")
            n_fail += 1
            continue
        gtypes = {c: str(got.schema.field(c).type) for c in gcols}
        wtypes = {c: str(want.schema.field(c).type) for c in wcols}
        type_note = ""
        if gtypes != wtypes:
            diffs = {c: (gtypes[c], wtypes[c])
                     for c in gcols if gtypes[c] != wtypes[c]}
            type_note = f" [dtype diff: {diffs}]"
        if got.num_rows != want.num_rows:
            print(f"FAIL {name}: rows {got.num_rows} != {want.num_rows}{type_note}")
            n_fail += 1
            continue
        grows = sorted(tuple(norm(r[c]) for c in gcols)
                       for r in got.to_pylist())
        wrows = sorted(tuple(norm(r[c]) for c in wcols)
                       for r in want.to_pylist())
        if grows != wrows:
            bad = next((i, a, b) for i, (a, b) in
                       enumerate(zip(grows, wrows)) if a != b)
            print(f"FAIL {name}: values differ at sorted row {bad[0]}:\n"
                  f"  got  {bad[1]}\n  want {bad[2]}{type_note}")
            n_fail += 1
            continue
        print(f"PASS {name} ({got.num_rows} rows){type_note}")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
