#!/usr/bin/env python3
"""Cross-PROCESS check of the streaming catalog sink: one JVM drives real
`writeStream.toTable` epochs (graft.StreamingIngestMain) while an
INDEPENDENT maintenance JVM (graft.MaintenanceMain) compacts the same
table mid-stream — the scheduled-maintenance-plus-continuous-ingest
deployment. Coordination is ONLY the on-disk commit protocol (exclusive
stage allocation, commit lock, pointer CAS with optimistic retry on both
sides). The final snapshot is then read OUTSIDE the JVMs by DuckDB: the
id set must be exactly 0..N-1 — zero lost updates (an epoch a compaction
clobbered) and zero duplicates (an epoch applied twice). Dev tool only.

Runs the WHOLE drill twice: once on the POSIX WarehouseIO and once on
the object-store primitive set (GRAFT_WAREHOUSE_IO=objectstore in every
launched JVM: conditional-PUT CAS, pointer objects, no rename/links).

Usage: python3 tools/verify_streaming_concurrent.py [epochs] [rowsPerEpoch] [io]
       io: local | objectstore | both (default both)
"""
import os
import shutil
import subprocess
import sys
import time

import duckdb

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 40
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
IO_MODES = ([sys.argv[3]] if len(sys.argv) > 3 and sys.argv[3] != "both"
            else ["local", "objectstore"])
BASE = "/tmp/graft_streaming_concurrent"
WH = f"{BASE}/wh"
REPO = "/root/repo"

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
    """The table pointer per IO impl: a symlink (local) or a tiny pointer
    FILE whose content names the version dir (objectstore)."""
    if os.path.islink(path):
        return os.path.realpath(path)
    if os.path.isfile(path):
        with open(path) as f:
            return os.path.join(os.path.dirname(path), f.read().strip())
    return path


def run_one(io_mode, layout="flat"):
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(WH)
    if not os.path.isdir(f"{REPO}/target/scala-2.13/classes/graft"):
        subprocess.run(["sbt", "-batch", "compile"], cwd=REPO, check=True)

    io_env = dict(os.environ, GRAFT_WAREHOUSE_IO=io_mode)
    print(f"== [{io_mode}/{layout}] stream JVM ({EPOCHS} epochs x {ROWS} rows) vs maintenance JVMs ==")
    stream = subprocess.Popen(
        java_cmd("graft.StreamingIngestMain", WH, str(EPOCHS), str(ROWS),
                 layout),
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=io_env)

    # maintenance ticks while the stream runs: each is a REAL separate JVM
    # compacting the sink table; the stream's epoch commits must CAS-retry
    # over its pointer swaps (and vice versa)
    compactions = 0
    env = dict(io_env, GRAFT_COMPACT_TARGET_FILES="8",
               SPARK_GRAFT_CPUS="8")
    while stream.poll() is None:
        time.sleep(4)
        if stream.poll() is not None:
            break
        r = subprocess.run(java_cmd("graft.MaintenanceMain", WH, "sink"),
                           capture_output=True, text=True, env=env,
                           timeout=300)
        if r.returncode != 0:
            print(r.stdout[-2000:])
            print(r.stderr[-2000:])
            raise SystemExit("maintenance JVM failed mid-stream")
        compactions += 1
        print(f"[maint] compaction tick {compactions} done")
    out, _ = stream.communicate(timeout=60)
    if stream.returncode != 0:
        print(out[-3000:])
        raise SystemExit(f"stream JVM exited {stream.returncode}")
    epochs_done = out.count("epoch ")
    assert compactions >= 1, "the stream outran every maintenance tick; rerun"

    # independent verification: resolve the pointer (flat) or walk the
    # in-place partition tree (timed), read OUTSIDE every JVM
    if layout.startswith("timed"):
        glob = f"{WH}/sink/**/*.parquet"
    else:
        snap = resolve_pointer(f"{WH}/sink")
        glob = f"{snap}/*.parquet"
    con = duckdb.connect()
    got = con.sql(
        f"SELECT count(*) AS n, count(DISTINCT id) AS d, "
        f"min(id) AS lo, max(id) AS hi "
        f"FROM read_parquet('{glob}')").fetchone()
    n, d, lo, hi = got
    want = EPOCHS * ROWS
    assert n == want and d == want and lo == 0 and hi == want - 1, (
        f"lost updates or duplicates: n={n} distinct={d} lo={lo} hi={hi} "
        f"want={want}")
    print(f"PASS [{io_mode}/{layout}]: {n} rows, exact id set 0..{want - 1} "
          f"through {epochs_done} streamed epochs and {compactions} "
          f"concurrent compaction JVMs (zero lost updates, zero duplicates)")


def main():
    for io_mode in IO_MODES:
        run_one(io_mode)
    # the time-partitioned layout's own epoch commit, on the substrate
    # where it diverges from Spark's rename-based dynamic overwrite
    run_one("objectstore", layout="timed")
    # mid-stream day->hour grain evolution: the stream flips the spec at
    # the halfway epoch while the concurrent maintenance JVMs migrate
    # day-era days through the RENAME-FREE manifest flip — exactness of
    # the final census proves the flip loses nothing under concurrency
    run_one("objectstore", layout="timed-evolve")


if __name__ == "__main__":
    main()
