#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run each SparkEntry oracle SQL in
DuckDB over the same parquet tables, compare against the Verify.scala parquet
dumps (row count, column names, sorted-value hash). Dev tool only — the
engine library itself never depends on this.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir>
"""
import json, math, sys, glob, os, re
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # exact: the engine is built so doubles are bit-identical across
        # engines; a tolerant compare here could hide what the driver sees
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def type_key(t):
    """Canonical arrow-type string for cross-engine compare. The driver's
    hash is sensitive to the physical type (round-11 lesson: Spark
    decimal(28,2) vs DuckDB DECIMAL(38,2) hashed differently with equal
    values), so decimal precision/scale, int width and timestamp unit must
    match exactly. Cosmetic differences that the driver does NOT see are
    normalized away: large_string vs string, timestamp tz annotation,
    dictionary encoding."""
    s = str(t)
    s = s.replace("large_string", "string").replace("large_binary", "binary")
    s = re.sub(r"^dictionary<values=([^,>]+).*$", r"\1", s)
    s = re.sub(r"^timestamp\[(\w+)[^\]]*\]$", r"timestamp[\1]", s)
    s = s.replace("large_list", "list")
    # list item types recurse through the same cosmetic cleanup
    s = re.sub(r"<item: ([^>]+)>", lambda m: "<item: " + type_key(m.group(1)) + ">", s)
    return s


def schema_types(schema, cols):
    by_name = {f.name.lower(): type_key(f.type) for f in schema}
    return {c: by_name[c] for c in cols}


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    recs = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return recs


def main(out_dir, sf_dir, only=None):
    # sf0.1 oracles (all-pairs ANN ground truth, big window sorts) blow
    # past duckdb's default in-memory budget. The limit must sit WELL
    # UNDER the host's commit limit (no swap + overcommit heuristic
    # refuses near ~60GB on this 125GB box): a too-generous budget makes
    # duckdb allocate toward the OS wall and die on bad_alloc BEFORE its
    # own spill logic engages; a tight budget + a temp spill dir lets the
    # heavy oracles complete out-of-core so the sweep grades the ENGINE.
    # 24GB/16 threads (was 40GB/32): the round-12 sweep's two BPE-chain
    # skips were exactly this — per-thread list-building overhead on 32
    # threads pushed transient allocation past the wall before the 40GB
    # budget ever bound; measured passing at 24GB/16.
    def fresh_con():
        # a just-OOMed instance releases its arenas asynchronously; an
        # immediate reconnect can catch the allocator mid-teardown
        import gc, time
        last = None
        for attempt in range(6):
            gc.collect()
            try:
                return _connect()
            except duckdb.OutOfMemoryException as e:
                last = e
                time.sleep(2 * (attempt + 1))
        raise last

    def _connect():
        c = duckdb.connect(config={
            "memory_limit": "24GB",
            "threads": "16",
            "temp_directory": "/tmp/duckdb_spill_check",
        })
        for t in TABLES:
            pth = f"{sf_dir}/{t}.parquet"
            if os.path.exists(pth):
                c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{pth}'")
        return c

    con = fresh_con()
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only is not None:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = n_capacity = 0
    for name in sorted(oracle):
        res_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(res_glob):
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            o = con.sql(oracle[name])
            o_cols, o_rows = [c.lower() for c in o.columns], o.fetchall()
        except duckdb.OutOfMemoryException as e:
            # the ORACLE ran out of capacity, not the engine: reconnect
            # (a failed allocation can poison the connection's allocator)
            # and grade this query as oracle-capacity-bound, not a FAIL
            print(f"SKIP {name}: oracle capacity (duckdb OOM): {e}")
            n_capacity += 1
            try:
                con.close()  # the failed instance holds its reservations
            except Exception:
                pass
            import gc; gc.collect()
            con = fresh_con()
            continue
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            s = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols, s_rows = [c.lower() for c in s.columns], s.fetchall()
        except duckdb.OutOfMemoryException as e:
            print(f"SKIP {name}: result-load capacity (duckdb OOM): {e}")
            n_capacity += 1
            try:
                con.close()
            except Exception:
                pass
            import gc; gc.collect()
            con = fresh_con()
            continue
        if sorted(o_cols) != sorted(s_cols):
            print(f"FAIL {name}: columns spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            n_fail += 1
            continue
        if len(o_rows) != len(s_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
            continue
        # arrow-level type compare: the driver's hash is type-sensitive,
        # so equal values with mismatched physical types are still a FAIL
        o_types = schema_types(o.arrow().schema, o_cols)
        s_files = sorted(glob.glob(res_glob))
        s_types = schema_types(pq.read_schema(s_files[0]), s_cols)
        type_diff = {c: (s_types[c], o_types[c]) for c in o_types
                     if s_types.get(c) != o_types[c]}
        if type_diff:
            print(f"FAIL {name}: arrow type mismatch (spark vs oracle):")
            for c, (a, b) in sorted(type_diff.items()):
                print(f"   {c}: spark={a} oracle={b}")
            n_fail += 1
            continue
        ok = frame_key(o_cols, o_rows)
        sk = frame_key(s_cols, s_rows)
        if ok != sk:
            bad = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs:")
            for a, b in bad:
                print(f"   spark : {a[:200]}\n   oracle: {b[:200]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows; types equal: "
                  + ",".join(f"{c}={s_types[c]}" for c in sorted(s_types)) + ")")
            n_pass += 1
    cap = f", {n_capacity} oracle-capacity skips" if n_capacity else ""
    print(f"\n{n_pass} pass, {n_fail} fail{cap}")
    if only is not None and n_capacity and not n_fail:
        return 3  # capacity, not a mismatch
    return 1 if n_fail else 0


def main_isolated(out_dir, sf_dir):
    """Per-query SUBPROCESS isolation for large-SF sweeps: a duckdb OOM
    poisons its process's allocator beyond reconnects (observed: even a
    fresh connect() dies after one bad_alloc), so each oracle gets its
    own interpreter and capacity failures die alone. Slower (one JVM-less
    python + view setup per query, ~1s overhead) - use for sf0.1+."""
    import subprocess
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_capacity = 0
    for name in sorted(oracle):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), out_dir, sf_dir,
             "--only", name],
            capture_output=True, text=True)
        body = [l for l in r.stdout.splitlines()
                if l.startswith(("PASS", "FAIL", "SKIP"))]
        print("\n".join(body) if body else
              f"SKIP {name}: worker died (rc={r.returncode}; capacity)")
        # classify by the worker's VERDICT line: a worker that printed
        # SKIP and then died tearing down (the post-OOM reconnect) is
        # still a capacity skip, not an engine mismatch
        if any(l.startswith("PASS") for l in body):
            n_pass += 1
        elif any(l.startswith("FAIL") for l in body):
            n_fail += 1
        else:
            n_capacity += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_capacity} oracle-capacity skips")
    return 1 if n_fail else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    if "--isolate" in args:
        args.remove("--isolate")
        sys.exit(main_isolated(args[0], args[1]))
    if "--only" in args:
        i = args.index("--only")
        names = set(args[i + 1:])
        sys.exit(main(args[0], args[1], only=names))
    sys.exit(main(args[0], args[1]))
