#!/usr/bin/env python3
"""Sustained MIXED-workload soak (round-19 verdict item 4): one table
takes, at the same time and from INDEPENDENT JVMs,

  - streaming ingest  (graft.SoakMain ingest  - writeStream.toTable
    epochs onto main),
  - branch DML + cherrypick publishes (graft.SoakMain branch - WAP
    INSERT+UPDATE on branch 'fix', then CALL cherrypick onto the moving
    main),
  - maintenance ticks (graft.MaintenanceMain - the declared clustering
    makes each tick a sort-order/incremental re-cluster + orphan sweep),
  - snapshot-expiry ticks (graft.SoakMain expire - keep_last=4 behind
    the branch/tag pins).

Coordination is ONLY the on-disk commit protocol (exclusive stage
allocation, commit lock, pointer CAS + optimistic retry). The final
snapshot is then read OUTSIDE every JVM by DuckDB against the exact
model: stream ids 0..E*R-1 with v=(id%97)/4.0, plus per published
cherrypick round its 1000 reserved ids (10_000_000+r*1000..) with
v=3.0 on the lower half and v=2.0 on the upper - zero lost updates,
zero duplicates, zero cross-contamination. Runs on BOTH IO substrates.

The round-20 MOR mode soaks the merge-on-read DML surface instead of
the branch role: the table declares write.delete.mode=merge-on-read
and the DML JVM issues, per round over 20_000_000+r*1000, an INSERT
(1000 rows v=1.0), a delta MERGE (lower 500 -> v=4.0: new data file +
equality sidecar retracting the old images), and a sidecar DELETE
(top 200) against the LIVE main, while maintenance ticks fold the
sidecars mid-stream. The audit additionally requires every sidecar
folded (the raw-parquet read is only the logical content then) and
models the updated/deleted slices exactly.

Usage: python3 tools/verify_soak.py [epochs] [rowsPerEpoch] [rounds] [io] [mode]
       io:   local | objectstore | both (default both)
       mode: cow | mor | both (default both)
"""
import os
import shutil
import subprocess
import sys
import time

import duckdb

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 24
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
IO_MODES = ([sys.argv[4]] if len(sys.argv) > 4 and sys.argv[4] != "both"
            else ["local", "objectstore"])
DML_MODES = ([sys.argv[5]] if len(sys.argv) > 5 and sys.argv[5] != "both"
             else ["cow", "mor"])
BASE = "/tmp/graft_soak"
WH = f"{BASE}/wh"
REPO = "/root/repo"
RESERVED = 10_000_000
RESERVED2 = 20_000_000

ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


def java_cmd(main, *args):
    cp = f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*"
    flags = []
    for p in ADD_OPENS:
        flags += ["--add-opens", f"{p}=ALL-UNNAMED"]
    return (["java", "-Xmx4g", "-cp", cp] + flags +
            ["-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
             main] + list(args))


def resolve_pointer(path):
    if os.path.islink(path):
        return os.path.realpath(path)
    if os.path.isfile(path):
        with open(path) as f:
            return os.path.join(os.path.dirname(path), f.read().strip())
    return path


def wait_for(proc, needle, timeout=240):
    t0 = time.time()
    while True:
        line = proc.stdout.readline()
        if line:
            sys.stdout.write(line)
            if needle in line:
                return
        if proc.poll() is not None:
            raise SystemExit(f"JVM exited before '{needle}'")
        if time.time() - t0 > timeout:
            raise SystemExit(f"timed out waiting for '{needle}'")


def run_one(io_mode, dml_mode="cow"):
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(WH)
    if not os.path.isdir(f"{REPO}/target/scala-2.13/classes/graft"):
        subprocess.run(["sbt", "-batch", "compile"], cwd=REPO, check=True)
    env = dict(os.environ, GRAFT_WAREHOUSE_IO=io_mode, SPARK_GRAFT_CPUS="8")

    print(f"== [{io_mode}/{dml_mode}] soak: {EPOCHS}x{ROWS} stream rows, "
          f"{ROUNDS} {'mor-dml' if dml_mode == 'mor' else 'cherrypick'} "
          f"rounds, maintenance+expiry ticks ==")
    # 4s between epochs: the stream must stay live across the branch
    # JVM's warm-up and several maintenance/expiry ticks — the
    # interleave IS the drill
    ingest_args = ["ingest", WH, str(EPOCHS), str(ROWS), "4000"]
    if dml_mode == "mor":
        ingest_args.append("mor")
    ingest = subprocess.Popen(
        java_cmd("graft.SoakMain", *ingest_args),
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=env)
    wait_for(ingest, "SEEDED")
    dml_role = "mordml" if dml_mode == "mor" else "branch"
    branch = subprocess.Popen(
        java_cmd("graft.SoakMain", dml_role, WH, str(ROUNDS)),
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=env)

    # maintenance + expiry ticks while BOTH workers run; keep ticking
    # until the branch role has published every round. A tick that LOSES
    # its pointer CAS to the live stream is the scheduled-job reality
    # (the rewrite re-runs next tick), so conflict-shaped failures are
    # tolerated MID-soak; anything else aborts, and the final tick after
    # the workers drain must succeed cleanly.
    CONFLICT_MARKS = ("during rewrite", "ConcurrentModification",
                      "moved from")
    ticks = lost_ticks = expiries = 0
    tick_env = dict(env, GRAFT_COMPACT_TARGET_FILES="8")

    def maintenance_tick(final):
        nonlocal ticks, lost_ticks
        r = subprocess.run(java_cmd("graft.MaintenanceMain", WH, "soak"),
                           capture_output=True, text=True, env=tick_env,
                           timeout=300)
        if r.returncode == 0:
            ticks += 1
            return
        blob = r.stdout + r.stderr
        if not final and any(m in blob for m in CONFLICT_MARKS):
            lost_ticks += 1
            print("[tick] maintenance lost its CAS to the live stream "
                  "(retries next tick)")
            return
        print(r.stdout[-2000:])
        print(r.stderr[-2000:])
        raise SystemExit("maintenance JVM failed mid-soak")

    while ingest.poll() is None or branch.poll() is None:
        time.sleep(3)
        if ingest.poll() is not None and branch.poll() is not None:
            break
        maintenance_tick(final=False)
        e = subprocess.run(java_cmd("graft.SoakMain", "expire", WH),
                           capture_output=True, text=True, env=env,
                           timeout=120)
        if e.returncode != 0:
            print(e.stdout[-2000:])
            print(e.stderr[-2000:])
            raise SystemExit("expiry JVM failed mid-soak")
        expiries += 1
        print(f"[tick] maintenance {ticks} ok / {lost_ticks} lost, "
              f"expiry {expiries} done")
    for name, p in (("ingest", ingest), (dml_role, branch)):
        out, _ = p.communicate(timeout=120)
        if out:
            sys.stdout.write(out)
        if p.returncode != 0:
            raise SystemExit(f"{name} JVM exited {p.returncode}")
    # quiesced table: the final tick must land (and leaves the snapshot
    # clustered for the audit)
    maintenance_tick(final=True)
    assert ticks >= 1, "no maintenance tick ever succeeded; rerun"

    # independent audit: DuckDB reads the final snapshot outside any JVM.
    # In MOR mode the raw data files are the LOGICAL content only once
    # every sidecar/delta is folded — the final tick's cluster folds
    # first; require the fold actually landed (one extra tick heals a
    # sidecar that raced in behind the final tick)
    snap = resolve_pointer(f"{WH}/soak")
    if dml_mode == "mor":
        def pending_sidecars():
            out = []
            for d in ("_eqdeletes", "_posdeletes"):
                p = os.path.join(resolve_pointer(f"{WH}/soak"), d)
                if os.path.isdir(p):
                    out += [os.path.join(d, x) for x in os.listdir(p)]
            return out
        if pending_sidecars():
            maintenance_tick(final=True)
            snap = resolve_pointer(f"{WH}/soak")
        assert not pending_sidecars(), (
            f"sidecars survived the final fold: {pending_sidecars()}")
    con = duckdb.connect()
    rel = f"read_parquet('{snap}/*.parquet')"
    want_stream = EPOCHS * ROWS
    n, d = con.sql(
        f"SELECT count(*), count(DISTINCT id) FROM {rel}").fetchone()
    want_total = want_stream + ROUNDS * (800 if dml_mode == "mor" else 1000)
    assert n == want_total and d == want_total, (
        f"lost updates or duplicates: n={n} distinct={d} want={want_total}")
    sn, slo, shi, sbad = con.sql(
        f"SELECT count(*), min(id), max(id), "
        f"sum(CASE WHEN v <> (id % 97) / 4.0 THEN 1 ELSE 0 END) "
        f"FROM {rel} WHERE id < {RESERVED}").fetchone()
    assert (sn, slo, shi, sbad) == (want_stream, 0, want_stream - 1, 0), (
        f"stream rows wrong: n={sn} lo={slo} hi={shi} badv={sbad}")
    for r in range(ROUNDS):
        if dml_mode == "mor":
            lo = RESERVED2 + r * 1000
            mid, dlo, hi = lo + 500, lo + 800, lo + 1000
            rn, upd, kept, ghosts = con.sql(
                f"SELECT count(*), "
                f"sum(CASE WHEN id < {mid} AND v = 4.0 THEN 1 ELSE 0 END), "
                f"sum(CASE WHEN id >= {mid} AND id < {dlo} "
                f"    AND v = 1.0 THEN 1 ELSE 0 END), "
                f"sum(CASE WHEN id >= {dlo} THEN 1 ELSE 0 END) "
                f"FROM {rel} WHERE id >= {lo} AND id < {hi}").fetchone()
            assert (rn, upd, kept, ghosts) == (800, 500, 300, 0), (
                f"mor round {r} content wrong: n={rn} updated={upd} "
                f"kept={kept} deleted-resurrected={ghosts}")
        else:
            lo = RESERVED + r * 1000
            mid, hi = lo + 500, lo + 1000
            rn, upd, ins = con.sql(
                f"SELECT count(*), "
                f"sum(CASE WHEN id < {mid} AND v = 3.0 THEN 1 ELSE 0 END), "
                f"sum(CASE WHEN id >= {mid} AND v = 2.0 THEN 1 ELSE 0 END) "
                f"FROM {rel} WHERE id >= {lo} AND id < {hi}").fetchone()
            assert (rn, upd, ins) == (1000, 500, 500), (
                f"round {r} content wrong: n={rn} updated={upd} "
                f"inserted={ins}")
    per_round = 800 if dml_mode == "mor" else 1000
    verb = "mor-dml'd" if dml_mode == "mor" else "cherrypicked"
    print(f"PASS [{io_mode}/{dml_mode}]: {n} rows exact "
          f"({want_stream} streamed + {ROUNDS * per_round} {verb}, "
          f"updates applied, deletes held) through {ticks} maintenance "
          f"ticks and {expiries} expiry ticks "
          f"(zero lost updates, zero duplicates)")


def main():
    for io_mode in IO_MODES:
        for dml_mode in DML_MODES:
            run_one(io_mode, dml_mode)


if __name__ == "__main__":
    main()
