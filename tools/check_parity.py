#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate — value AND type strict.

Usage: check_parity.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with views
over <sfDir>/*.parquet, reads the Spark result parquet from
<verifyOutDir>/<name>/, and compares:

  1. column names (sorted),
  2. column TYPES per name (DESCRIBE both sides) — the round-7 lesson:
     the driver's hasher canonicalizes DuckDB HUGEINT (int128, produced
     by sum()/'//' over BIGINT) differently from BIGINT, so identical
     values still hash-mismatch. Any oracle column typed HUGEINT, or any
     width/class divergence beyond the benign INTEGER-vs-BIGINT pair, is
     a TYPEFAIL even when every value compares equal.
  3. row-ordered values, exact equality.

Prints PASS/FAIL/TYPEFAIL per query; exit 1 on any failure.
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

# Divergences that the driver's Python-int canonicalization provably
# collapses (same fetch type, same repr). Everything else is fatal.
_BENIGN_PAIRS = {
    frozenset({"TINYINT", "BIGINT"}), frozenset({"SMALLINT", "BIGINT"}),
    frozenset({"INTEGER", "BIGINT"}), frozenset({"TINYINT", "INTEGER"}),
    frozenset({"SMALLINT", "INTEGER"}), frozenset({"FLOAT", "DOUBLE"}),
}

def type_divergences(mine_types, ref_types):
    """(col, spark_type, oracle_type) for every fatal type mismatch.

    HUGEINT / DECIMAL / any non-benign divergence on the oracle side is
    fatal even if values match — that is the channel the driver hashes.
    """
    bad = []
    for c in sorted(ref_types):
        mt, rt = mine_types.get(c, "?"), ref_types[c]
        if mt == rt:
            continue
        if frozenset({mt.split("(")[0], rt.split("(")[0]}) in _BENIGN_PAIRS:
            continue
        bad.append((c, mt, rt))
    # HUGEINT in oracle output is fatal even if Spark somehow matched it
    for c, rt in ref_types.items():
        if "HUGEINT" in rt and not any(b[0] == c for b in bad):
            bad.append((c, mine_types.get(c, "?"), rt))
    return bad

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
    n_pass = n_fail = n_type = 0
    for name, sql in sorted(oracle.items()):
        pq = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pq, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            mdesc = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()
            rdesc = con.execute(f"DESCRIBE ({sql})").fetchall()
            mine_types = {r[0]: r[1] for r in mdesc}
            ref_types = {r[0]: r[1] for r in rdesc}
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
        tbad = type_divergences(mine_types, ref_types)
        if tbad:
            det = ", ".join(f"{c}: spark={mt} oracle={rt}" for c, mt, rt in tbad)
            print(f"TYPEFAIL {name}: {det}")
            n_type += 1; n_fail += 1
            # fall through to value compare for diagnostics only
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
            if not tbad: n_fail += 1
        elif not tbad:
            print(f"PASS {name} ({len(m)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail ({n_type} type-strict)")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
