#!/usr/bin/env python3
"""Independent consumer of the merge-on-read mirror's ON-DISK layout.

Drives the SHIPPED CLI (graft.PipelineMain) with GRAFT_MIRROR_MOR=true, then
reconstructs the mirror's visible state OUTSIDE the JVM — a DuckDB
reimplementation of the documented read protocol:

  1. base   = realpath(<table>/base)            (atomic version pointer)
  2. horizon = int(<base>/_folded_through)       (-1 when absent)
  3. deltas = <table>/deltas/batch_i  for i > horizon
  4. state  = latest row per key by (ts, _ingest_seq) over base + deltas,
              NULLs ordering below any real value; rows with op = 'D' hidden

and compares it against an independent pandas fold of the generated change
history. This is the Iceberg-substrate promise made checkable: the MOR
format is a table contract, not a private Spark structure — any engine that
can read parquet and sort can consume it. Dev tool only.

Usage: python3 tools/verify_mor_layout.py [seed]
"""
import os
import random
import shutil
import subprocess
import sys
from datetime import datetime, timedelta

import duckdb
import pandas as pd

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 42
BASE = "/tmp/graft_mor_e2e"
SRC = f"{BASE}/src/test_table"
WH = f"{BASE}/wh"

EPOCH = datetime(2026, 1, 1)
_clock = [0]


def ts():
    _clock[0] += 1
    return (EPOCH + timedelta(seconds=_clock[0])).isoformat()


def run_pipeline():
    env = dict(os.environ, GRAFT_MIRROR_MOR="true", GRAFT_MIRROR_BUCKETS="8")
    cmd = ["sbt", "-batch", f"runMain graft.PipelineMain {WH} id ts {SRC}"]
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True,
                       timeout=600, env=env)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        raise SystemExit(f"pipeline exited {r.returncode}")
    return r.stdout


def mor_state_sql():
    """The independent read protocol: returns SQL selecting the visible
    state (id, name, modification_date, ts) from the raw layout."""
    table = f"{WH}/test_table"
    base = os.path.realpath(f"{table}/base")
    assert os.path.isdir(base), f"no MOR base under {table}"
    marker = os.path.join(base, "_folded_through")
    horizon = int(open(marker).read().strip()) if os.path.exists(marker) else -1
    delta_dir = f"{table}/deltas"
    deltas = []
    if os.path.isdir(delta_dir):
        for d in sorted(os.listdir(delta_dir)):
            if d.startswith("batch_") and int(d.split("_")[1]) > horizon:
                deltas.append(os.path.join(delta_dir, d))
    scans = [f"SELECT * FROM parquet_scan('{base}/**/*.parquet', union_by_name=true)"]
    scans += [f"SELECT * FROM parquet_scan('{d}/*.parquet', union_by_name=true)"
              for d in deltas]
    allrows = " UNION ALL BY NAME ".join(scans)
    return (f"SELECT id, name, modification_date, ts FROM ("
            f"  SELECT *, row_number() OVER (PARTITION BY id "
            f"    ORDER BY ts DESC NULLS LAST, _ingest_seq DESC NULLS LAST) AS rn"
            f"  FROM ({allrows}))"
            f" WHERE rn = 1 AND (op IS NULL OR op <> 'D')"), len(deltas)


def compare(con, expected_df, label):
    con.register("expected", expected_df)
    visible, n_deltas = mor_state_sql()
    extra = con.sql(f"{visible} EXCEPT SELECT * FROM expected").df()
    missing = con.sql(f"SELECT * FROM expected EXCEPT {visible}").df()
    if len(extra) or len(missing):
        print("EXTRA rows:\n", extra.head(20))
        print("MISSING rows:\n", missing.head(20))
        raise SystemExit(f"FAIL {label}: independent MOR read != expected")
    n = con.sql(f"SELECT count(*) FROM ({visible})").fetchone()[0]
    print(f"PASS {label}: independent MOR read == expected "
          f"({n} rows, {n_deltas} live deltas merged)")


def main():
    rng = random.Random(SEED)
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(SRC)

    load_ts = ts()
    table = pd.DataFrame({
        "id": range(1, 61),
        "name": [f"name{i}" for i in range(1, 61)],
        "modification_date": [load_ts] * 60,
    })
    table.to_parquet(f"{SRC}/LOAD00000001.parquet", engine="pyarrow")
    last_ts = {i: None for i in table["id"]}

    def write_batch(fname, n_upd, n_del, inserts=()):
        nonlocal table
        logs = []
        for new_id in inserts:
            t = ts()
            row = {"id": new_id, "name": f"name{new_id}",
                   "modification_date": t}
            table = pd.concat([table, pd.DataFrame([row])], ignore_index=True)
            last_ts[new_id] = t
            logs.append({**row, "table": "test_table", "op": "I", "ts": t})
        for _ in range(n_upd):
            idx = rng.choice(list(table.index))
            t = ts()
            table.loc[idx, "name"] = f"updated_name{idx}"
            table.loc[idx, "modification_date"] = t
            row = table.loc[idx].to_dict()
            last_ts[row["id"]] = t
            logs.append({**row, "table": "test_table", "op": "U", "ts": t})
        for _ in range(n_del):
            idx = rng.choice(list(table.index))
            row = table.loc[idx].to_dict()
            table = table.drop(idx)
            t = ts()
            last_ts.pop(row["id"], None)
            logs.append({**row, "table": "test_table", "op": "D", "ts": t})
        cols = ["id", "name", "modification_date", "table", "op", "ts"]
        pd.DataFrame(logs)[cols].to_parquet(f"{SRC}/{fname}", engine="pyarrow")

    def expected():
        df = table.reset_index(drop=True).copy()
        df["ts"] = df["id"].map(lambda k: last_ts.get(k))
        return df[["id", "name", "modification_date", "ts"]]

    con = duckdb.connect()

    print("== run 1: LOAD seed + 3 change batches (MOR sink) ==")
    for i in range(3):
        write_batch(f"dms_logs_{i + 1}.parquet", 5, 2)
    out = run_pipeline()
    print("\n".join(l for l in out.splitlines() if "[pipeline]" in l))
    compare(con, expected(), "run1")

    print("== run 2: same command, checkpoint no-op ==")
    run_pipeline()
    compare(con, expected(), "run2 (idempotent)")

    print("== run 3: a new batch lands as an O(delta) commit ==")
    write_batch("dms_logs_4.parquet", 4, 2, inserts=(61, 62))
    before = os.path.getmtime(os.path.realpath(f"{WH}/test_table/base"))
    run_pipeline()
    after = os.path.getmtime(os.path.realpath(f"{WH}/test_table/base"))
    assert before == after, "FAIL: the incremental batch rewrote the base"
    print("PASS run3: base untouched by the delta commit")
    compare(con, expected(), "run3 (incremental)")

    print(f"\nALL PASS (seed={SEED})")


if __name__ == "__main__":
    main()
