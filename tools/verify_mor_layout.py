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
import json
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


def rename_map():
    """Declared renames from the warehouse `_metadata` registry — part of
    the on-disk contract: old-name files must rejoin the current column
    (the externalized Iceberg field-id table). Resolved transitively."""
    p = f"{WH}/_metadata/test_table.json"
    if not os.path.exists(p):
        return {}
    props = json.load(open(p))
    raw = {k[len("schema.rename."):]: v for k, v in props.items()
           if k.startswith("schema.rename.")}
    out = {}
    for frm in raw:
        cur = frm
        for _ in range(len(raw) + 1):
            if cur in raw:
                cur = raw[cur]
            else:
                break
        out[frm] = cur
    return out


def declare_rename(old, new):
    """Write the registry directly (merge-preserving) — the checker's
    independence: it speaks the props-file contract, not the Scala API."""
    p = f"{WH}/_metadata/test_table.json"
    os.makedirs(os.path.dirname(p), exist_ok=True)
    props = json.load(open(p)) if os.path.exists(p) else {}
    props[f"schema.rename.{old}"] = new
    json.dump(props, open(p, "w"))


def mor_state_sql():
    """The independent read protocol: returns SQL selecting the visible
    state (id, <name col>, modification_date, ts) from the raw layout,
    applying any declared renames (coalesce new over old — a physical row
    only ever carries one of them)."""
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
    rn_map = rename_map()
    avail = [r[0] for r in duckdb.sql(
        f"DESCRIBE SELECT * FROM ({allrows})").fetchall()]

    def colexpr(logical):
        cur = rn_map.get(logical, logical)
        olds = [o for o, n in rn_map.items() if n == cur and o in avail]
        if cur in avail and olds:
            return f"coalesce({cur}, {', '.join(olds)}) AS {cur}"
        if cur not in avail and olds:
            return f"{olds[0]} AS {cur}"
        return cur

    sel = ", ".join(colexpr(c) for c in ("id", "name", "modification_date", "ts"))
    return (f"SELECT {sel} FROM ("
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

    # logical "name" column — run 4 renames it upstream; the generator's
    # batches then CARRY the new name while old files keep the old one
    name_col = ["name"]

    def write_batch(fname, n_upd, n_del, inserts=()):
        nonlocal table
        nc = name_col[0]
        logs = []
        for new_id in inserts:
            t = ts()
            row = {"id": new_id, nc: f"name{new_id}",
                   "modification_date": t}
            table = pd.concat([table, pd.DataFrame([row])], ignore_index=True)
            last_ts[new_id] = t
            logs.append({**row, "table": "test_table", "op": "I", "ts": t})
        for _ in range(n_upd):
            idx = rng.choice(list(table.index))
            t = ts()
            table.loc[idx, nc] = f"updated_name{idx}"
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
        cols = ["id", nc, "modification_date", "table", "op", "ts"]
        pd.DataFrame(logs)[cols].to_parquet(f"{SRC}/{fname}", engine="pyarrow")

    def expected():
        df = table.reset_index(drop=True).copy()
        df["ts"] = df["id"].map(lambda k: last_ts.get(k))
        return df[["id", name_col[0], "modification_date", "ts"]]

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

    print("== run 4: declared rename name->full_name lands mid-stream ==")
    # the rename is a METADATA commit (registry write), no data rewritten;
    # upstream batches from here on carry the new column name while the
    # base and all earlier deltas keep the old one — the independent read
    # must fold both into ONE history via the registry
    declare_rename("name", "full_name")
    name_col[0] = "full_name"
    table = table.rename(columns={"name": "full_name"})
    write_batch("dms_logs_5.parquet", 4, 1, inserts=(63,))
    run_pipeline()
    compare(con, expected(), "run4 (renamed column rejoins history)")

    print("== run 5: scheduled maintenance JVM (compact + tombstone horizon + orphan GC) ==")
    # plant crashed-stage debris aged past the guard — the maintenance
    # role must sweep it, fold the live deltas, and leave the visible
    # state byte-identical
    import time
    staging = f"{WH}/test_table/deltas/.batch_99.staging"
    os.makedirs(staging)
    open(f"{staging}/part-half.parquet", "w").write("half")
    old_t = time.time() - 120
    os.utime(f"{staging}/part-half.parquet", (old_t, old_t))
    os.utime(staging, (old_t, old_t))
    env = dict(os.environ, GRAFT_ORPHAN_AGE_MS="60000")
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.MaintenanceMain {WH}"],
        cwd="/root/repo", capture_output=True, text=True, timeout=600, env=env)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        raise SystemExit(f"maintenance exited {r.returncode}")
    print("\n".join(l for l in r.stdout.splitlines() if "[maintenance]" in l))
    assert not os.path.exists(staging), "aged crashed delta stage must be swept"
    compare(con, expected(), "run5 (post-maintenance, deltas folded)")

    print(f"\nALL PASS (seed={SEED})")


if __name__ == "__main__":
    main()
