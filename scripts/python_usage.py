#!/usr/bin/env python3
"""pandas -> Arrow IPC -> graft SQL -> pandas/polars round trip.

The reference engine's flagship client surface is querying an
in-process dataframe by name (its examples/python_usage.py
query_pandas/query_polars). graft's equivalent is the Arrow IPC
bridge: the host writes its frames as Arrow IPC stream files, invokes
`graft.ArrowQuery` with a SQL string over the bound names, and reads
the Arrow result back — no JVM bindings, no serialization format
beyond Arrow.

Usage: python3 scripts/python_usage.py   (from the repo root; ~1 min,
dominated by sbt/JVM startup — a long-lived host would keep the
session warm instead of paying it per query)
"""
import json
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.ipc


def write_ipc(df: pd.DataFrame, dir_: Path) -> None:
    """pandas frame -> one Arrow IPC *stream* file (the format
    ArrowInterop.readIpc expects), named like a committed part."""
    dir_.mkdir(parents=True, exist_ok=True)
    table = pa.Table.from_pandas(df, preserve_index=False)
    with pa.ipc.new_stream(dir_ / "part-00000.arrow", table.schema) as w:
        w.write_table(table)


def read_ipc(dir_: Path) -> pd.DataFrame:
    parts = sorted(dir_.glob("*.arrow"))
    assert parts, f"no .arrow files under {dir_}"
    frames = []
    for p in parts:
        with pa.ipc.open_stream(p) as r:
            frames.append(r.read_all().to_pandas())
    return pd.concat(frames, ignore_index=True)


def main() -> int:
    work = Path(tempfile.mkdtemp(prefix="graft_python_usage_"))
    try:
        # --- host-side frames, exactly as a notebook user would build them
        sales = pd.DataFrame({
            "region_id": [1, 1, 2, 2, 3, 3, 3],
            "amount": [10.0, 20.0, 5.0, 7.5, 1.0, 2.0, 4.0],
        })
        regions = pd.DataFrame({
            "region_id": [1, 2, 3],
            "region_name": ["emea", "amer", "apac"],
        })
        write_ipc(sales, work / "sales")
        write_ipc(regions, work / "regions")

        sql = ("SELECT r.region_name, COUNT(*) AS n_sales, "
               "SUM(s.amount) AS total "
               "FROM sales s JOIN regions r ON s.region_id = r.region_id "
               "GROUP BY r.region_name ORDER BY r.region_name")
        out = work / "result"

        # --- one engine invocation: bind both frames, run SQL, write IPC
        cmd = ["sbt", "-batch",
               f'runMain graft.ArrowQuery {out} {json.dumps(sql)} '
               f'sales={work / "sales"} regions={work / "regions"}']
        proc = subprocess.run(cmd, cwd=Path(__file__).resolve().parent.parent,
                              capture_output=True, text=True)
        if '"arrow_query":"ok"' not in proc.stdout:
            print(proc.stdout[-3000:], file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            raise RuntimeError("graft.ArrowQuery did not report success")

        # --- back into pandas, checked against a pure-pandas replay
        got = read_ipc(out).sort_values("region_name").reset_index(drop=True)
        expect = (sales.merge(regions, on="region_id")
                  .groupby("region_name")
                  .agg(n_sales=("amount", "size"), total=("amount", "sum"))
                  .reset_index().sort_values("region_name")
                  .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype({"n_sales": "int64"}),
            expect.astype({"n_sales": "int64"}), check_like=True)
        print("pandas round trip OK:")
        print(got.to_string(index=False))

        # --- polars leg (optional: exercised when polars is installed)
        try:
            import polars as pl
            got_pl = pl.from_pandas(got)
            assert got_pl.filter(pl.col("region_name") == "apac")["total"][0] == 7.0
            print("polars round trip OK:", got_pl.shape)
        except ImportError:
            print("polars not installed - pandas leg verified, "
                  "polars leg skipped (pl.from_arrow reads the same IPC)")
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
