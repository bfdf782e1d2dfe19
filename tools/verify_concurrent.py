#!/usr/bin/env python3
"""Cross-PROCESS multi-writer commit check: two independent JVMs — an
ingest writer (sequential MOR delta commits) and a maintenance compactor
(compaction loop) — share one warehouse with no coordination beyond the
on-disk commit protocol (exclusive stage allocation + commit lock + CAS
with optimistic retry). The final state is then reconstructed OUTSIDE the
JVM by DuckDB from the raw layout (same read protocol as
verify_mor_layout.py) and compared against the arithmetic expectation of
the generated change history. Zero lost updates is the pass condition.

This is the forked-JVM tier of ConcurrentCommitSpec (which drives the
same shape with threads): it exercises the lock file and the atomic
delta-publish rename across real process boundaries. Dev tool only.

Usage: python3 tools/verify_concurrent.py [nBatches]
"""
import os
import shutil
import subprocess
import sys
import time

import duckdb

# 48 default: long enough that the slow consumer's cursor usually falls
# behind a fold at least once, exercising the re-bootstrap path
N = int(sys.argv[1]) if len(sys.argv) > 1 else 48
BASE = "/tmp/graft_concurrent_e2e"
WH = f"{BASE}/wh"
TABLE = "m"
STOP = f"{BASE}/stop"
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


def java_cmd(*args):
    cp = f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*"
    flags = []
    for p in ADD_OPENS:
        flags += ["--add-opens", f"{p}=ALL-UNNAMED"]
    return (["java", "-Xmx4g", "-cp", cp] + flags +
            ["-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
             "graft.ConcurrentStress"] + list(args))


def run(*args, timeout=300):
    r = subprocess.run(java_cmd(*args), capture_output=True, text=True,
                       timeout=timeout)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        raise SystemExit(f"role {args[0]} exited {r.returncode}")
    return r.stdout


def main():
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(WH)
    # classes must exist (sbt compile is the builder's loop; don't race it)
    if not os.path.isdir(f"{REPO}/target/scala-2.13/classes/graft"):
        subprocess.run(["sbt", "-batch", "compile"], cwd=REPO, check=True)

    run("init", WH, TABLE, "8")

    consumer_out = f"{BASE}/consumer_rows.txt"
    print(f"== three independent JVMs: writer (1..{N}) vs compactor vs consumer ==")
    writer = subprocess.Popen(java_cmd("writer", WH, TABLE, "1", str(N)),
                              stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                              text=True)
    compactor = subprocess.Popen(java_cmd("compactor", WH, TABLE, STOP),
                                 stdout=subprocess.PIPE,
                                 stderr=subprocess.DEVNULL, text=True)
    # consumer polls SLOWLY (600ms) on purpose: several writer batches +
    # a compaction land between polls, so the cursor falls behind the
    # fold horizon and the loud-failure + foldHorizon re-bootstrap path
    # actually runs (the printed rebootstraps count shows it)
    # consumer stderr is KEPT (unlike the chatty writer/compactor): when
    # the consumer dies the exception is the whole diagnosis, and a
    # devnull'd one cost a debugging session
    consumer = subprocess.Popen(java_cmd("consumer", WH, TABLE, STOP,
                                         consumer_out, "600"),
                                stdout=subprocess.PIPE,
                                stderr=open(f"{BASE}/consumer.stderr", "w"),
                                text=True)
    wout, _ = writer.communicate(timeout=600)
    if writer.returncode != 0:
        raise SystemExit(f"writer JVM exited {writer.returncode}")
    open(STOP, "w").write("done")
    cout, _ = compactor.communicate(timeout=600)
    if compactor.returncode != 0:
        raise SystemExit(f"compactor JVM exited {compactor.returncode}")
    sout, _ = consumer.communicate(timeout=600)
    if consumer.returncode != 0:
        err = open(f"{BASE}/consumer.stderr").read()
        print(err[-3000:])
        raise SystemExit(f"consumer JVM exited {consumer.returncode}")
    print(wout.strip())
    print(cout.strip())
    print(sout.strip())

    # independent read of the final layout (verify_mor_layout protocol)
    table = f"{WH}/{TABLE}"
    base = os.path.realpath(f"{table}/base")
    marker = os.path.join(base, "_folded_through")
    horizon = int(open(marker).read().strip()) if os.path.exists(marker) else -1
    deltas = []
    ddir = f"{table}/deltas"
    if os.path.isdir(ddir):
        for d in sorted(os.listdir(ddir)):
            if d.startswith("batch_") and int(d.split("_")[1]) > horizon:
                deltas.append(os.path.join(ddir, d))
    scans = [f"SELECT * FROM parquet_scan('{base}/**/*.parquet', union_by_name=true)"]
    scans += [f"SELECT * FROM parquet_scan('{d}/*.parquet', union_by_name=true)"
              for d in deltas]
    allrows = " UNION ALL BY NAME ".join(scans)
    got = duckdb.sql(
        f"SELECT id, name FROM ("
        f"  SELECT *, row_number() OVER (PARTITION BY id "
        f"    ORDER BY ts DESC NULLS LAST, _ingest_seq DESC NULLS LAST) AS rn"
        f"  FROM ({allrows}))"
        f" WHERE rn = 1 AND (op IS NULL OR op <> 'D') ORDER BY id").fetchall()

    # arithmetic expectation: key i<N -> u_{i+1}; key N -> v_N
    expected = [(i, f"u{i + 1}") for i in range(N)] + [(N, f"v{N}")]
    missing = sorted(set(expected) - set(got))
    extra = sorted(set(got) - set(expected))
    if missing or extra:
        print(f"missing={missing[:10]} extra={extra[:10]}")
        raise SystemExit(
            f"LOST UPDATES across concurrent JVMs ({len(missing)} missing, "
            f"{len(extra)} extra)")
    print(f"PASS: {len(got)} rows, zero lost updates across writer+compactor JVMs "
          f"(horizon={horizon}, live deltas={len(deltas)})")

    # the LIVE consumer's replica — maintained incrementally via
    # changesSince (with foldHorizon re-bootstrap when compaction outran
    # its cursor) while both other JVMs ran — must ALSO equal expectation
    got_c = []
    for line in open(consumer_out).read().splitlines():
        if line.strip():
            i, name = line.split(",", 1)
            got_c.append((int(i), name))
    missing_c = sorted(set(expected) - set(got_c))
    extra_c = sorted(set(got_c) - set(expected))
    if missing_c or extra_c:
        print(f"consumer missing={missing_c[:10]} extra={extra_c[:10]}")
        raise SystemExit("LIVE CONSUMER diverged from the mirror state")
    print(f"PASS: live changesSince consumer replica exact "
          f"({len(got_c)} rows) under concurrent writes + compactions")


if __name__ == "__main__":
    main()
