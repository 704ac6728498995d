#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: check_parity.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with views
over <sfDir>/*.parquet, reads the Spark result parquet from
<verifyOutDir>/<name>/, and compares (column names sorted, row-ordered
values, exact equality). Prints PASS/FAIL per query.
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    if isinstance(v, list): return tuple(canon(x) for x in v)
    if isinstance(v, tuple): return tuple(canon(x) for x in v)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pq = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pq, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            mine = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            mine_cols = [d[0] for d in con.description]
            ref = con.execute(sql).fetchall()
            ref_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error {str(e)[:200]}"); n_fail += 1; continue
        if sorted(mine_cols) != sorted(ref_cols):
            print(f"FAIL {name}: cols {sorted(mine_cols)} vs {sorted(ref_cols)}")
            n_fail += 1; continue
        # driver sorts columns by name before hashing values
        mperm = [mine_cols.index(c) for c in sorted(mine_cols)]
        rperm = [ref_cols.index(c) for c in sorted(ref_cols)]
        m = [tuple(canon(r[i]) for i in mperm) for r in mine]
        f = [tuple(canon(r[i]) for i in rperm) for r in ref]
        if len(m) != len(f):
            print(f"FAIL {name}: rows {len(m)} vs {len(f)}"); n_fail += 1; continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(m, f)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(m)} rows differ; first@{i}:")
            print(f"  spark: {a}\n  duck : {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(m)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
