#!/usr/bin/env python3
"""External bench anchor (r13 VERDICT directive 4): time the DuckDB
oracle's own wall-clock for the TPC-H battery, so bench_vs_baseline has
a denominator that is not the engine's previous round.

Usage: bench_duckdb.py <sfDir> <oracle_sql.json> [reps] [suffix]

`suffix` (e.g. "_sf1") names the output artifacts
duckdb_baseline<suffix>.json so a scale-anchor run doesn't clobber the
sf0.1 artifacts. <sfDir> tables may be single parquet FILES (driver
testdata) or Spark-written DIRECTORIES (ScaleProof output) — the latter
are registered via a /*.parquet glob.

Runs each oracle SQL in DuckDB over views on <sfDir>/*.parquet, `reps`
interleaved passes (the graft.Bench cadence: pass 1 of every query,
then pass 2, ... so a host-load burst hits each query in at most one
pass), and writes:

  tools/duckdb_baseline.json      -- full detail (median/min per query,
                                     passes, threads, version, load)
  tools/duckdb_baseline_sec.json  -- {query: median_sec} only; graft.Bench
                                     embeds this file verbatim as the
                                     bench artifact's "baseline_duckdb_sec"

Methodology notes recorded in BASELINE.md §DuckDB anchor: DuckDB runs
the FULL query including its ORDER BY, results are fetched (fetchall)
to force materialization — the analog of Bench's noop-sink write — and
tables are pre-registered as views over the same parquet files Spark
reads (DuckDB's parquet reader caches OS pages the same way Spark's
does across the warmup pass).
"""
import sys, os, json, time, statistics
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    suffix = sys.argv[4] if len(sys.argv) > 4 else ""
    sql = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    threads = con.execute("SELECT current_setting('threads')").fetchone()[0]
    version = con.execute("SELECT version()").fetchone()[0]
    names = sorted(sql)
    # warmup pass (OS page cache + duckdb metadata), not billed
    for n in names:
        con.execute(sql[n]).fetchall()
    samples = {n: [] for n in names}
    passes = []
    for _ in range(reps):
        t0 = time.time()
        for n in names:
            q0 = time.time()
            con.execute(sql[n]).fetchall()
            samples[n].append(time.time() - q0)
        passes.append({"total": time.time() - t0,
                       "load_avg": os.getloadavg()[0]})
    med = {n: statistics.median(samples[n]) for n in names}
    mins = {n: min(samples[n]) for n in names}
    out_dir = os.path.dirname(os.path.abspath(__file__))
    detail = {"sf": sf_dir, "reps": reps, "threads": threads,
              "duckdb_version": version,
              "total_median": sum(med.values()),
              "total_min": sum(mins.values()),
              "queries": med, "queries_min": mins, "passes": passes}
    with open(os.path.join(out_dir, f"duckdb_baseline{suffix}.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    with open(os.path.join(out_dir, f"duckdb_baseline{suffix}_sec.json"), "w") as f:
        json.dump(med, f, sort_keys=True)
    print(json.dumps({"total_median": detail["total_median"],
                      "total_min": detail["total_min"],
                      "threads": threads, "version": version}))

if __name__ == "__main__":
    main()
