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


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(res_glob):
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            o = con.sql(oracle[name])
            o_cols, o_rows = [c.lower() for c in o.columns], o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        s = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        s_cols, s_rows = [c.lower() for c in s.columns], s.fetchall()
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
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
