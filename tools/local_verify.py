#!/usr/bin/env python3
"""Dev-only replica of the driver's t2 correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <outDir> [query ...]

Assumes `graft.Verify` already dumped <outDir>/<name>/ parquet and
<outDir>/oracle_sql.json. Runs each oracle SQL in DuckDB against the
sfDir parquet tables and compares values column-by-column (columns
sorted by name, rows in emitted order).
"""
import sys, json, math, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def eq(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, (float, int)):
        return a == b or (math.isclose(a, b, rel_tol=0, abs_tol=0))
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({spark_files!r})").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns spark={sorted(got_cols)} oracle={sorted(want_cols)}")
            n_fail += 1
            continue
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        wi = [want_cols.index(c) for c in sorted(want_cols)]
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
            n_fail += 1
            continue
        bad = None
        for r, (g, w) in enumerate(zip(got, want)):
            for ci, (x, y) in enumerate(zip([g[i] for i in gi], [w[i] for i in wi])):
                if not eq(x, y):
                    bad = (r, sorted(got_cols)[ci], x, y)
                    break
            if bad:
                break
        if bad:
            r, c, x, y = bad
            print(f"FAIL {name}: row {r} col {c}: spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
