#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check.py [sf_dir] [verify_out_dir] [query ...]

Reads verify_out_dir/oracle_sql.json, runs each SQL in DuckDB with the
fixture tables registered as views, loads the Spark parquet result, sorts
columns by name (as the driver does) and rows by all columns, then compares
cell-by-cell. Exact match required; float near-misses are reported with the
max abs diff so decimal-vs-double drift is visible.
"""
import duckdb, hashlib, json, math, sys

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
    # Per-query diagnostic record (written to out/local_check.json): row
    # counts and md5 of the canonically-rendered sorted rows for BOTH the
    # spark parquet and the local-DuckDB oracle, as seen through THIS
    # DuckDB's value space. Commit a copy alongside the round artifacts: a
    # future driver-side hash mismatch can then be localized (driver-spark
    # vs local-spark via Verify's spark_check.json; local-spark vs
    # local-oracle here) instead of being invisible to the local gate.
    local = {}

    def rows_md5(rows):
        return hashlib.md5(
            "\n".join(repr(r) for r in rows).encode("utf-8")).hexdigest()
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
        local[name] = {
            "spark_rows": len(grows), "oracle_rows": len(erows),
            "spark_md5": rows_md5(grows), "oracle_md5": rows_md5(erows),
        }
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
            local[name]["first_mismatch"] = {
                "row": bad[0], "oracle": repr(bad[1]), "spark": repr(bad[2])}
            print(f"FAIL {name}: first mismatch row {bad[0]}:\n  oracle: {bad[1]}\n  spark:  {bad[2]}\n  max float diff: {maxdiff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(erows)} rows)")
            n_pass += 1
    with open(f"{out}/local_check.json", "w") as f:
        json.dump(local, f, indent=1, sort_keys=True)
    print(f"== {n_pass} passed, {n_fail} failed ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
