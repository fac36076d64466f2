#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (for pre-commit use only).

Reads the Verify.scala output dir (per-query parquet + oracle_sql.json),
runs each oracle in DuckDB against the same sf parquet tables, and
compares: schema (column names), row count, and a value hash computed on
columns sorted by name and rows sorted by all columns.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir> [reportJson]

The optional third arg writes the per-query verdicts as a JSON file —
used to commit the sf1 re-certification (selfcheck_sf1.json) each
round, so the at-scale oracle result is part of the round record.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cell(v):
    if isinstance(v, float):
        return f"{v:.10g}"
    return str(v)


def table_hash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()


def connect(sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    # explicit, modest limit: the default (80% of RAM) lets each
    # in-memory instance's buffer pool grow unbounded, and across a
    # 150-query sweep the process accumulates enough residue that a
    # ~256 KB block allocation eventually fails mid-suite (observed at
    # sf1 on duckdb 1.0.0, s09's PQ replay) even though every single
    # oracle fits comfortably — the heaviest needs ~7 GB alone
    con.execute("SET memory_limit='24GB'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (GenScale sf1 output): a DIRECTORY of
            # part files, vs the driver fixtures' single parquet file
            src = f"{p}/*.parquet"
        elif os.path.exists(p):
            src = p
        else:
            continue
        # Spark-written corpora store timestamps as INT64 micros with
        # isAdjustedToUTC (TIMESTAMP_MICROS — the encoding that keeps
        # parquet pushdown; see GraftEngine.session), which DuckDB
        # types as TIMESTAMPTZ. Re-cast those columns to naive
        # TIMESTAMP under the UTC session: value-identical instants,
        # and renders/comparisons match the driver fixtures' naive
        # timestamp[us] exactly.
        cols = con.execute(f"DESCRIBE SELECT * FROM read_parquet('{src}')").fetchall()
        tz = [c[0] for c in cols if c[1] == "TIMESTAMP WITH TIME ZONE"]
        repl = (" REPLACE (" + ", ".join(
            f'CAST("{c}" AS TIMESTAMP) AS "{c}"' for c in tz) + ")") if tz else ""
        con.execute(f"CREATE VIEW {t} AS SELECT *{repl} FROM read_parquet('{src}')")
    return con


def main(sf_dir, out_dir, report_json=None):
    report = {}
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_noracle = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*")):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            report[name] = {"status": "fail", "reason": "no parquet output"}
            n_bad += 1
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        if name not in oracles:
            print(f"----  {name}: rows-only check, rows={len(got)}")
            report[name] = {"status": "rows-only", "rows": len(got)}
            n_noracle += 1
            continue
        # one connection PER ORACLE: DuckDB 1.0.0's buffer pool does not
        # fully release across a 150+-query session — at sf1 the
        # accumulated footprint eventually fails ~256 KB block
        # allocations with 100+ GB of limit nominally free (s09's PQ
        # replay was the first casualty). Per-query isolation costs
        # only view re-registration.
        con = connect(sf_dir)
        want = canon(con.execute(oracles[name]).fetchdf())
        con.close()
        ok_cols = list(got.columns) == list(want.columns)
        ok_rows = len(got) == len(want)
        ok_hash = ok_cols and ok_rows and table_hash(got) == table_hash(want)
        if ok_hash:
            print(f"PASS  {name}: rows={len(got)}")
            report[name] = {"status": "pass", "rows": len(got)}
            n_ok += 1
        else:
            n_bad += 1
            report[name] = {"status": "fail", "rows_got": len(got),
                            "rows_want": len(want)}
            print(f"FAIL  {name}: cols got={list(got.columns)} want={list(want.columns)} "
                  f"rows got={len(got)} want={len(want)}")
            if ok_cols and ok_rows:
                diff = (got.astype(str) != want.astype(str)).any(axis=1)
                print("  first diffs:\n", got[diff].head(3), "\n  vs\n", want[diff].head(3))
    print(f"\n{n_ok} pass, {n_bad} fail, {n_noracle} rows-only")
    if report_json:
        with open(report_json, "w") as f:
            json.dump({"sf_dir": sf_dir, "pass": n_ok, "fail": n_bad,
                       "rows_only": n_noracle, "queries": report}, f, indent=1)
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
