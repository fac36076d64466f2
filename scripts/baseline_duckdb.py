#!/usr/bin/env python3
"""Absolute single-node baseline (round-3 verdict item 6): time the
DuckDB oracle suite on the same parquet tables the Spark bench reads,
so BENCH totals have a computable cross-engine bar.

Methodology mirrors graft.Bench: per query, one untimed warmup, two
timed runs, keep the min. Queries without an oracle (rows-only) are
skipped. Results merge into BASELINE.json under "duckdb_baseline"
(existing driver metadata preserved).

Usage: python3 scripts/baseline_duckdb.py <sfDir> <verifyOutDir>
           [--write] [--skip name1,name2] [--key duckdb_baseline]
       (<verifyOutDir> must contain oracle_sql.json from graft.Verify)
"""
import sys, json, time, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, vout = sys.argv[1], sys.argv[2]
    write = "--write" in sys.argv
    key = sys.argv[sys.argv.index("--key") + 1] if "--key" in sys.argv else "duckdb_baseline"
    skip = set()
    if "--skip" in sys.argv:
        skip = set(sys.argv[sys.argv.index("--skip") + 1].split(","))
    all_oracles = json.load(open(os.path.join(vout, "oracle_sql.json")))
    oracles = {k: v for k, v in all_oracles.items() if k not in skip}

    # one bounded connection PER ORACLE — selfcheck.py's workaround for
    # duckdb 1.0.0's buffer pool, which accumulates residue across a
    # 150-query process under the default 80%-of-RAM limit and fails
    # ~256 KB allocations mid-suite at sf1 even though every oracle
    # passes alone. Per-query timings are unaffected (the warmup run
    # repopulates whatever OS cache matters before the timed passes).
    def connect():
        con = duckdb.connect()
        con.execute("SET TimeZone='UTC'")
        con.execute("SET memory_limit='24GB'")
        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            # Spark-written tables are directories of part files
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            if not (os.path.isdir(p) or os.path.exists(p)):
                continue
            # TIMESTAMP_MICROS corpora (Spark-written; isAdjustedToUTC)
            # read as TIMESTAMPTZ — re-cast to naive TIMESTAMP under
            # the UTC session so semantics and renders match the
            # driver fixtures' naive timestamps (selfcheck.py does the
            # same; value-identical instants)
            cols = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')").fetchall()
            tz = [c[0] for c in cols if c[1] == "TIMESTAMP WITH TIME ZONE"]
            repl = (" REPLACE (" + ", ".join(
                f'CAST("{c}" AS TIMESTAMP) AS "{c}"' for c in tz) + ")") if tz else ""
            con.execute(f"CREATE VIEW {t} AS SELECT *{repl} FROM read_parquet('{src}')")
        return con

    # GRAFT_BASELINE_PASSES (default 2): timed passes after the warmup.
    # A 1-pass run is annotated in the summary so cross-round readers
    # know the methodology (used when wall-clock bounds a big-SF sweep).
    passes = int(os.environ.get("GRAFT_BASELINE_PASSES", "2"))
    # GRAFT_BASELINE_WARMUP=0 skips the untimed warmup run — for
    # ten-minute oracles the warmup's OS-cache effect is negligible
    # next to doubling the sweep's wall clock. Recorded in the summary.
    warmup = os.environ.get("GRAFT_BASELINE_WARMUP", "1") != "0"

    def flush(results, done):
        """Incremental merge into BASELINE.json (atomic rename): a
        long sweep interrupted by the round boundary keeps every
        completed oracle instead of losing the run."""
        if not write:
            return
        base = json.load(open("BASELINE.json"))
        # Merge the prior record's queries under the new results (new
        # wins per query): a resumed partial sweep keeps its completed
        # oracles, and an INCREMENTAL update (--skip everything but a
        # few re-timed/new entries) keeps the complete record instead
        # of wiping it down to the current process's handful. Prior
        # entries whose query no longer exists in oracle_sql.json are
        # dropped (renamed/removed queries don't linger).
        prior = {k: v for k, v in
                 base.get(key, {}).get("queries", {}).items()
                 if k in all_oracles}
        prior_meth = {k: v for k, v in
                      base.get(key, {}).get("methodology", {}).items()
                      if k in all_oracles}
        # a transient failure (-1) must not clobber a prior good
        # timing — keep the prior number, note the failed retry
        merged = dict(prior)
        failed_retries = []
        for k, v in results.items():
            if v < 0 and prior.get(k, -1.0) >= 0:
                failed_retries.append(k)
            else:
                merged[k] = v
                # methodology is recorded PER QUERY: a merged record
                # can mix sweeps run under different pass/warmup
                # settings, and a summary-level stamp would silently
                # misdescribe the carried-over entries
                prior_meth[k] = {"timed_passes": passes, "warmup": warmup}
        results = merged
        done = done and all(k in results for k in all_oracles)
        ok = {k: v for k, v in results.items() if v >= 0}
        base[key] = {
            "engine": f"duckdb {duckdb.__version__}",
            "sf": sf_dir,
            "total_sec": round(sum(ok.values()), 2),
            "n_queries": len(ok),
            "failed": len(results) - len(ok),
            # names with NO recorded number at all (skip minus whatever
            # the prior record already covers)
            "skipped": sorted(k for k in all_oracles if k not in results),
            "timed_passes": passes,
            "warmup": warmup,
            "failed_retries_kept_prior": sorted(failed_retries),
            "partial": not done,
            "queries": results,
            "methodology": prior_meth,
        }
        tmp = "BASELINE.json.tmp"
        json.dump(base, open(tmp, "w"), indent=2)
        os.replace(tmp, "BASELINE.json")

    # GRAFT_BASELINE_ORDER_KEY: sweep in ascending cost order of a
    # previously recorded key (e.g. the sf1 baseline) instead of
    # alphabetically - a wall-clock-bounded big-SF sweep then records
    # the maximum number of completed oracles before the window closes.
    # Per-query numbers are unaffected (queries are independent, one
    # bounded connection each).
    order = sorted(oracles)
    okey = os.environ.get("GRAFT_BASELINE_ORDER_KEY")
    if okey:
        prior = json.load(open("BASELINE.json")).get(okey, {}).get("queries", {})
        order = sorted(oracles, key=lambda n: (prior.get(n, 1e9), n))

    results = {}
    for i, name in enumerate(order):
        sql = oracles[name]
        con = connect()
        try:
            if warmup:
                con.execute(sql).fetchall()  # warmup
            times = []
            for _ in range(passes):
                t0 = time.monotonic()
                con.execute(sql).fetchall()
                times.append(time.monotonic() - t0)
            results[name] = round(min(times), 4)
        except Exception as e:
            print(f"[baseline] {name} FAILED: {e}", file=sys.stderr)
            results[name] = -1.0
        finally:
            con.close()
        print(f"{name}: {results[name]}", flush=True)
        if i % 5 == 4:
            flush(results, done=False)

    ok = {k: v for k, v in results.items() if v >= 0}
    total = round(sum(ok.values()), 2)
    summary = {
        "engine": f"duckdb {duckdb.__version__}",
        "sf": sf_dir,
        "total_sec": total,
        "n_queries": len(ok),
        "failed": len(results) - len(ok),
        "skipped": sorted(skip),
        "queries": results,
    }
    print(json.dumps({"metric": "duckdb_total", "value": total,
                      "unit": "sec", "n": len(ok)}))
    if write:
        flush(results, done=True)
        print("[baseline] merged into BASELINE.json")


if __name__ == "__main__":
    main()
