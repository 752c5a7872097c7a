#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check.py [sf_dir] [verify_out_dir] [query ...]

Reads verify_out_dir/oracle_sql.json, runs each SQL in DuckDB with the
fixture tables registered as views, loads the Spark parquet result, sorts
columns by name (as the driver does) and rows by all columns, then compares
cell-by-cell. Exact match required; float near-misses are reported with the
max abs diff so decimal-vs-double drift is visible.
"""
import duckdb, json, math, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            cur = con.execute(sql)
            expcols = [d[0] for d in cur.description]
            exp = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            cur = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
            gotcols = [d[0] for d in cur.description]
            got = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        if sorted(expcols) != sorted(gotcols):
            print(f"FAIL {name}: columns oracle={sorted(expcols)} spark={sorted(gotcols)}")
            n_fail += 1
            continue
        eidx = [expcols.index(c) for c in sorted(expcols)]
        gidx = [gotcols.index(c) for c in sorted(gotcols)]
        erows = sorted([tuple(norm(r[i]) for i in eidx) for r in exp], key=repr)
        grows = sorted([tuple(norm(r[i]) for i in gidx) for r in got], key=repr)
        if len(erows) != len(grows):
            print(f"FAIL {name}: rowcount oracle={len(erows)} spark={len(grows)}")
            n_fail += 1
            continue
        bad = None
        maxdiff = 0.0
        for i, (a, b) in enumerate(zip(erows, grows)):
            if a != b:
                for x, y in zip(a, b):
                    if isinstance(x, float) and isinstance(y, float):
                        maxdiff = max(maxdiff, abs(x - y))
                if bad is None:
                    bad = (i, a, b)
        if bad:
            print(f"FAIL {name}: first mismatch row {bad[0]}:\n  oracle: {bad[1]}\n  spark:  {bad[2]}\n  max float diff: {maxdiff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(erows)} rows)")
            n_pass += 1
    print(f"== {n_pass} passed, {n_fail} failed ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
