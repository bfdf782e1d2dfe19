#!/usr/bin/env python3
"""Cross-process write-audit-publish check: a writer JVM stages DML
(INSERT + DELETE + UPDATE) on a branch while THIS process independently
polls main's snapshot with DuckDB — main must serve exactly the 1000-row
seed through every staged commit, and exactly the published model after
the one fast_forward CAS. Catches any path that leaks staged data into
main history (pointer moves, grandfather stamps, retention sweeps) at a
REAL process boundary, on both IO substrates.

Usage: verify_branch_wap.py [io_mode|both]
"""
import os
import shutil
import subprocess
import sys
import time

import duckdb

IO_MODES = ([sys.argv[1]] if len(sys.argv) > 1 and sys.argv[1] != "both"
            else ["local", "objectstore"])
BASE = "/tmp/graft_branch_wap"
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
    return (["java", "-Xmx3g", "-cp", cp] + flags +
            ["-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
             main] + list(args))


def resolve_pointer(path):
    if os.path.islink(path):
        return os.path.realpath(path)
    if os.path.isfile(path):
        with open(path) as f:
            return os.path.join(os.path.dirname(path), f.read().strip())
    return path


def main_state(wh):
    """(sorted ids, sum v) of main's CURRENT snapshot, read outside every
    JVM. None when the pointer is mid-create."""
    snap = resolve_pointer(f"{wh}/sink")
    if not os.path.isdir(snap):
        return None
    con = duckdb.connect()
    try:
        r = con.sql(
            f"SELECT count(*), count(DISTINCT id), min(id), max(id), "
            f"sum(v) FROM read_parquet('{snap}/*.parquet')").fetchone()
        return r
    except Exception:
        return None  # racing a commit's file landing: retry next poll
    finally:
        con.close()


def run_one(io_mode, mode="dml"):
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    wh = f"{BASE}/wh"
    os.makedirs(wh)
    env = dict(os.environ, GRAFT_WAREHOUSE_IO=io_mode)
    print(f"== [{io_mode}/{mode}] writer JVM stages branch {mode} commits; "
          f"this process audits main via DuckDB ==")
    writer = subprocess.Popen(
        java_cmd("graft.BranchWapMain", wh, "600", mode),
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True, env=env)
    published = False
    seeded = False
    polls = 0
    out_lines = []
    import threading
    def pump():
        for line in writer.stdout:
            out_lines.append(line.rstrip())
    t = threading.Thread(target=pump, daemon=True)
    t.start()
    while writer.poll() is None:
        time.sleep(0.2)
        seeded = seeded or any("SEEDED" in l for l in out_lines)
        published = published or any("PUBLISHED" in l for l in out_lines)
        if seeded and not published:
            st = main_state(wh)
            if st is not None:
                n, d, lo, hi, sv = st
                assert (n, d, lo, hi, sv) == (1000, 1000, 0, 999, 1000.0), (
                    f"STAGED DATA LEAKED INTO MAIN mid-audit: {st}")
                polls += 1
    t.join(timeout=10)
    assert writer.returncode == 0, (
        f"writer JVM exited {writer.returncode}\n" + "\n".join(out_lines[-20:]))
    assert polls >= 3, f"auditor barely ran ({polls} polls); raise pauseMs"
    if mode == "stream":
        # published model: seed(0..999,v=1) + three streamed epochs of
        # 300 rows each (1000..1899, v=2)
        st = main_state(wh)
        n, d, lo, hi, sv = st
        want_n = 1000 + 900
        want_sum = 1000 * 1.0 + 900 * 2.0
        assert (n, d, lo, hi) == (want_n, want_n, 0, 1899), f"published: {st}"
    else:
        # published model: seed(0..999,v=1) + staged(1100..1999) where
        # 1100..1199 have v=-1 and 1200..1999 v=2; 1000..1099 deleted
        st = main_state(wh)
        n, d, lo, hi, sv = st
        want_n = 1000 + 900
        want_sum = 1000 * 1.0 + 100 * (-1.0) + 800 * 2.0
        assert (n, d, lo, hi) == (want_n, want_n, 0, 1999), f"published: {st}"
    assert abs(sv - want_sum) < 1e-6, f"published sum: {sv} want {want_sum}"
    print(f"PASS [{io_mode}/{mode}]: main served exactly the seed through "
          f"{polls} mid-audit polls; one fast_forward published the "
          f"exact staged model ({want_n} rows)")


def main():
    if not os.path.isdir(f"{REPO}/target/scala-2.13/classes/graft"):
        subprocess.run(["sbt", "-batch", "compile"], cwd=REPO, check=True)
    for io_mode in IO_MODES:
        run_one(io_mode)
    # streaming epochs staged on the branch (round 17): real
    # writeStream.toTable commits under the WAP conf, audited from
    # outside, published by one fast_forward
    run_one("objectstore", mode="stream")
    print("\nALL PASS")


if __name__ == "__main__":
    main()
