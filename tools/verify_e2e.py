#!/usr/bin/env python3
"""Independent end-to-end check of the CDC pipeline CLI (graft.PipelineMain).

Port of /root/reference/sample_data_generator/generate_sample_dms_parquet.py
with a seed and an independent pandas fold as the expected result. Dev tool
only — the engine library never depends on this.

Layout generated under a scratch dir:
  src/test_table/LOAD00000001.parquet   initial full load (NO cdc envelope)
  src/test_table/dms_logs_<i>.parquet   U/D (and later I) change batches
  expected.parquet                      pandas fold of load + changes

Checks:
  1. mirror visible state == expected (DuckDB EXCEPT both ways)
  2. changelog row count == change-log rows only (LOAD* excluded)
  3. re-running the same command is a no-op (checkpoint: no re-ingest)
  4. a new batch dropped later is applied incrementally

Usage: python3 tools/verify_e2e.py [seed]
"""
import glob
import os
import random
import shutil
import subprocess
import sys
from datetime import datetime, timedelta

import duckdb
import pandas as pd

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 42
BASE = "/tmp/graft_e2e"
SRC = f"{BASE}/src/test_table"
WH = f"{BASE}/wh"

EPOCH = datetime(2026, 1, 1)
_clock = [0]


def ts():
    _clock[0] += 1
    return (EPOCH + timedelta(seconds=_clock[0])).isoformat()


def run_pipeline():
    cmd = ["sbt", "-batch", f"runMain graft.PipelineMain {WH} id ts {SRC}"]
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True,
                       timeout=600)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        raise SystemExit(f"pipeline exited {r.returncode}")
    return r.stdout


def mirror_glob():
    # the table path is a symlink pointer to the current version dir;
    # python's ** glob does not follow it, so resolve first
    real = os.path.realpath(f"{WH}/test_table")
    return f"{real}/**/*.parquet"


def changelog_count(con):
    real = os.path.realpath(f"{WH}/test_table_changelog")
    return con.sql(
        f"SELECT count(*) FROM parquet_scan('{real}/**/*.parquet')").fetchone()[0]


def compare_mirror(con, expected_df, label):
    con.register("expected", expected_df)
    visible = (f"SELECT id, name, modification_date, ts "
               f"FROM parquet_scan('{mirror_glob()}') "
               f"WHERE op IS NULL OR op <> 'D'")
    extra = con.sql(f"{visible} EXCEPT SELECT * FROM expected").df()
    missing = con.sql(f"SELECT * FROM expected EXCEPT {visible}").df()
    if len(extra) or len(missing):
        print("EXTRA rows in mirror:\n", extra.head(20))
        print("MISSING rows from mirror:\n", missing.head(20))
        raise SystemExit(f"FAIL {label}: mirror != expected")
    n = con.sql(f"SELECT count(*) FROM ({visible})").fetchone()[0]
    print(f"PASS {label}: mirror == expected ({n} rows)")


def main():
    rng = random.Random(SEED)
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(SRC)

    # initial full load — bare data schema, no envelope (DMS LOAD file)
    load_ts = ts()
    table = pd.DataFrame({
        "id": range(1, 101),
        "name": [f"name{i}" for i in range(1, 101)],
        "modification_date": [load_ts] * 100,
    })
    table.to_parquet(f"{SRC}/LOAD00000001.parquet", engine="pyarrow")
    # expected ts per key: NULL for rows only ever seen in the initial load
    last_ts = {i: None for i in table["id"]}

    n_log_rows = 0

    def write_batch(fname, n_upd, n_del, inserts=()):
        nonlocal table, n_log_rows
        logs = []
        for new_id in inserts:
            t = ts()
            row = {"id": new_id, "name": f"name{new_id}",
                   "modification_date": t}
            table = pd.concat([table, pd.DataFrame([row])], ignore_index=True)
            last_ts[new_id] = t
            logs.append({**row, "table": "test_table", "op": "I", "ts": t})
        for _ in range(n_upd):
            if not len(table.index):
                break
            idx = rng.choice(list(table.index))
            t = ts()
            table.loc[idx, "name"] = f"updated_name{idx}"
            table.loc[idx, "modification_date"] = t
            row = table.loc[idx].to_dict()
            last_ts[row["id"]] = t
            logs.append({**row, "table": "test_table", "op": "U", "ts": t})
        for _ in range(n_del):
            if not len(table.index):
                break
            idx = rng.choice(list(table.index))
            row = table.loc[idx].to_dict()
            table = table.drop(idx)
            t = ts()
            last_ts.pop(row["id"], None)
            logs.append({**row, "table": "test_table", "op": "D", "ts": t})
        df = pd.DataFrame(logs)[
            ["id", "name", "modification_date", "table", "op", "ts"]]
        df.to_parquet(f"{SRC}/{fname}", engine="pyarrow")
        n_log_rows += len(df)

    for i in range(5):
        write_batch(f"dms_logs_{i + 1}.parquet", 5, 3)

    def expected():
        df = table.reset_index(drop=True).copy()
        df["ts"] = df["id"].map(lambda k: last_ts.get(k))
        return df[["id", "name", "modification_date", "ts"]]

    con = duckdb.connect()

    print("== run 1: initial load + 5 change batches ==")
    out = run_pipeline()
    print("\n".join(l for l in out.splitlines() if "[pipeline]" in l))
    compare_mirror(con, expected(), "run1")
    c1 = changelog_count(con)
    assert c1 == n_log_rows, \
        f"FAIL: changelog has {c1} rows, generated {n_log_rows} change rows " \
        "(LOAD* exclusion broken?)"
    print(f"PASS run1: changelog rows == {n_log_rows} (LOAD excluded)")

    print("== run 2: same command, nothing new (checkpoint no-op) ==")
    run_pipeline()
    c2 = changelog_count(con)
    assert c2 == c1, f"FAIL: re-run re-ingested ({c1} -> {c2})"
    compare_mirror(con, expected(), "run2 (idempotent)")

    print("== run 3: drop a new batch with I+U+D, incremental apply ==")
    write_batch("dms_logs_6.parquet", 4, 2, inserts=(101, 102, 103))
    run_pipeline()
    c3 = changelog_count(con)
    assert c3 == n_log_rows, f"FAIL: changelog {c3} != generated {n_log_rows}"
    compare_mirror(con, expected(), "run3 (incremental)")

    print(f"\nALL PASS (seed={SEED})")


if __name__ == "__main__":
    main()
