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
  5. the REST-catalog seam (C1): a stub Iceberg-REST server runs for the
     whole session and the pipeline is driven with GRAFT_CATALOG_URL set —
     after run 1 both tables must be registered with their REAL column
     lists and carry the reference's CDC property wiring.

Usage: python3 tools/verify_e2e.py [seed]
"""
import glob
import json
import os
import random
import re
import shutil
import subprocess
import sys
import threading
from datetime import datetime, timedelta
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

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


# ---------------------------------------------------------------------
# Stub Iceberg-REST catalog: the wire surface RestCatalogClient speaks —
# token exchange, HEAD/GET table, create-table, commit set-properties.
# Python twin of the Scala spec's StubCatalog so the SHIPPED CLI path is
# exercised against the same protocol from outside the JVM.
# ---------------------------------------------------------------------
class StubCatalog:
    def __init__(self):
        self.tables = {}      # name -> properties dict
        self.creates = []     # (name, raw create body)
        self.evolutions = []  # (name, add-schema payload) commits
        self.token_calls = 0
        stub = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code, body=""):
                data = body.encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                if data:
                    self.wfile.write(data)

            def _table(self):
                m = re.fullmatch(r"/v1/namespaces/[^/]+/tables/([^/]+)",
                                 self.path)
                return m.group(1) if m else None

            def do_HEAD(self):
                t = self._table()
                self._reply(204 if t in stub.tables else 404)

            def do_GET(self):
                t = self._table()
                if t in stub.tables:
                    self._reply(200, json.dumps(
                        {"properties": stub.tables[t]}))
                else:
                    self._reply(404)

            def do_POST(self):
                body = self.rfile.read(
                    int(self.headers.get("Content-Length", 0))).decode()
                if self.path == "/ws/v1/oauth/tokens":
                    stub.token_calls += 1
                    self._reply(200, json.dumps({"access_token": "tok-e2e"}))
                    return
                if re.fullmatch(r"/v1/namespaces/[^/]+/tables", self.path):
                    name = json.loads(body)["name"]
                    stub.creates.append((name, body))
                    if name in stub.tables:
                        self._reply(409)
                    else:
                        stub.tables[name] = {}
                        self._reply(200, "{}")
                    return
                t = self._table()
                if t is not None:  # commit-table set-properties
                    if t not in stub.tables:
                        self._reply(404)
                        return
                    for upd in json.loads(body)["updates"]:
                        if upd.get("action") == "set-properties":
                            stub.tables[t].update(upd["updates"])
                        elif upd.get("action") == "add-schema":
                            stub.evolutions.append(
                                (t, json.dumps(upd["schema"])))
                    self._reply(200, "{}")
                    return
                self._reply(404)

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=self.server.serve_forever,
                         daemon=True).start()
        self.url = f"http://127.0.0.1:{self.server.server_address[1]}"

    def stop(self):
        self.server.shutdown()


CATALOG = None  # set in main()


def run_pipeline():
    cmd = ["sbt", "-batch", f"runMain graft.PipelineMain {WH} id ts {SRC}"]
    env = dict(os.environ,
               GRAFT_CATALOG_URL=CATALOG.url,
               GRAFT_CATALOG_NAMESPACE="e2e",
               GRAFT_CATALOG_CREDENTIAL="e2e-id:e2e-secret")
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True,
                       timeout=600, env=env)
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


def check_catalog():
    names = {n for n, _ in CATALOG.creates}
    assert names >= {"test_table", "test_table_changelog"}, \
        f"FAIL: catalog saw creates for {names}"
    for name, body in CATALOG.creates:
        fields = json.loads(body)["schema"]["fields"]
        cols = {f["name"] for f in fields}
        assert {"id", "name", "modification_date"} <= cols, \
            f"FAIL: {name} registered without its real columns: {cols}"
        if name.endswith("_changelog"):
            assert "op" in cols and "ts" in cols, \
                f"FAIL: changelog registered without the CDC envelope: {cols}"
    props = CATALOG.tables["test_table"]
    assert props.get("cdc.key-column") == "id" and \
        props.get("cdc.ts-column") == "ts", \
        f"FAIL: mirror CDC wiring missing from catalog: {props}"
    assert CATALOG.tables["test_table_changelog"].get(
        "dependent-tables", "").endswith("test_table"), \
        f"FAIL: changelog dependent-tables wiring missing"
    assert CATALOG.token_calls >= 1, "FAIL: no OAuth token exchange"
    print(f"PASS catalog: both tables registered with real schemas + "
          f"CDC wiring ({len(CATALOG.creates)} create calls, "
          f"{CATALOG.token_calls} token exchanges)")


def main():
    global CATALOG
    rng = random.Random(SEED)
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(SRC)
    CATALOG = StubCatalog()

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

    def write_batch(fname, n_upd, n_del, inserts=(), extra_col=None):
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
        cols = ["id", "name", "modification_date", "table", "op", "ts"]
        df = pd.DataFrame(logs)[cols]
        if extra_col:  # upstream schema evolution: a new column appears
            df[extra_col] = df["id"].map(lambda k: f"u{int(k)}@example.com")
        df.to_parquet(f"{SRC}/{fname}", engine="pyarrow")
        n_log_rows += len(df)
        return df

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
    check_catalog()

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

    print("== run 4: upstream schema evolution (new email column) ==")
    b7 = write_batch("dms_logs_7.parquet", 4, 2, extra_col="email")
    run_pipeline()
    compare_mirror(con, expected(), "run4 (evolved)")
    # changelog carries the new column; pre-evolution rows null-backfilled
    real_ch = os.path.realpath(f"{WH}/test_table_changelog")
    n_email = con.sql(
        f"SELECT count(email) FROM parquet_scan('{real_ch}/**/*.parquet', "
        f"union_by_name=true)").fetchone()[0]
    assert n_email == len(b7), \
        f"FAIL: changelog email non-nulls {n_email} != batch rows {len(b7)}"
    # mirror winners from the evolved batch carry email; older winners null
    b7_ts = set(b7["ts"])
    mrows = con.sql(
        f"SELECT id, email, ts FROM parquet_scan('{mirror_glob()}') "
        f"WHERE op IS NULL OR op <> 'D'").df()
    assert "email" in mrows.columns, "FAIL: mirror lost the evolved column"
    for _, r in mrows.iterrows():
        want = f"u{int(r['id'])}@example.com" if r["ts"] in b7_ts else None
        got = None if pd.isna(r["email"]) else r["email"]
        assert got == want, \
            f"FAIL: mirror email for id {r['id']}: {got!r} != {want!r}"
    # the catalog followed: one add-schema commit per table, carrying email
    evolved = {t for t, payload in CATALOG.evolutions if "email" in payload}
    assert {"test_table", "test_table_changelog"} <= evolved, \
        f"FAIL: catalog evolutions missing email: {CATALOG.evolutions}"
    print(f"PASS run4: schema evolution end-to-end "
          f"(changelog+mirror+catalog, {len(b7)} evolved rows)")

    # no-extensions arm (round 17): a fresh JVM with a runtime-registered
    # catalog must read pending MOR sidecars through the vectorized Union
    # split — the plan split is unconditional on session wiring
    r = subprocess.run(
        ["sbt", "-batch", "runMain graft.RuntimeCatalogCheck"],
        cwd="/root/repo", capture_output=True, text=True, timeout=600)
    assert r.returncode == 0 and "[runtime-catalog-check] PASS" in r.stdout, (
        f"FAIL: RuntimeCatalogCheck\n{r.stdout[-2000:]}\n{r.stderr[-1000:]}")
    print("PASS run5: un-extended session splits pending-sidecar scans "
          "(RuntimeCatalogCheck fresh JVM)")

    print(f"\nALL PASS (seed={SEED})")
    CATALOG.stop()


if __name__ == "__main__":
    main()
