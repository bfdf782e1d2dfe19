#!/usr/bin/env python3
"""Per-query bench REGRESSION GATE (round-10 verdict item 7): run the
Bench main, then compare its per-query map against the previous round's
bench artifact and FAIL LOUDLY (exit 1, offending pairs printed) when
any carried query exceeds `--ratio` x its previous time AND the noise
floor. The q70/q83 round-8 drift hunt cost a session because nothing
was watching per-query times; this makes the watch automatic at every
bench close.

Intentional changes go in tools/bench_allowlist.txt (one query name per
line, '#' comments) — an allowlisted regression prints but doesn't fail.

Noise handling, two defences (both observed necessary at round-11 close):

1. The NEW side is one sample. Sub-second queries flutter 0.1-0.2s
   run-to-run and the offender SET ROTATES (three consecutive runs each
   flagged a disjoint set of untouched queries). A real regression
   reproduces; flutter doesn't. So when the first run flags regressions,
   the gate re-runs the bench once and gates on min(run1, run2) —
   best-of-N — failing only reproducible regressions. --no-confirm
   restores single-run gating (and --no-run implies it).
2. The BASELINE side is ALSO one sample. q05 measured 0.92s in the
   round-10 artifact, a lucky 0.39s in the round-11 close, then ~0.9s in
   every subsequent run — "2.3x regression" against r11, 1.0x against
   r10. So --baseline accepts MULTIPLE artifacts and gates each query
   against its per-query MAX across them (any previously-accepted time
   is acceptable). Pass the last two round artifacts.

Usage:
  python3 tools/bench_gate.py --baseline BENCH_LOCAL_r10.json \
      [--out bench_out.json] [--ratio 1.5] [--floor 0.4] [--sf /root/testdata/sf0.1]

Runs `sbt runMain graft.Bench` itself (SPARK_GRAFT_SF_DIR set), writes
the bench line to --out, then gates. Pass --no-run to gate an existing
--out file instead.
"""
import argparse
import json
import os
import re
import subprocess
import sys

REPO = "/root/repo"


def load(path):
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = {}
    if isinstance(d, dict) and "queries" in d:
        return {k: float(v) for k, v in d["queries"].items() if float(v) >= 0}
    hay = d.get("tail", raw) if isinstance(d, dict) else raw
    pairs = re.findall(r'"(q[0-9][0-9a-z_]+)":([0-9.]+)', hay)
    return {k: float(v) for k, v in pairs}


def allowlist():
    p = os.path.join(REPO, "tools", "bench_allowlist.txt")
    if not os.path.exists(p):
        return set()
    return {l.strip() for l in open(p)
            if l.strip() and not l.strip().startswith("#")}


def run_bench(out_path, sf_dir):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd=REPO, capture_output=True, text=True,
                       timeout=3600, env=env)
    line = next((l for l in r.stdout.splitlines()
                 if l.startswith('{"metric"')), None)
    if r.returncode != 0 or line is None:
        print(r.stdout[-2000:])
        print(r.stderr[-2000:])
        raise SystemExit(f"bench run failed (rc={r.returncode})")
    open(out_path, "w").write(line + "\n")
    return line


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", required=True, nargs="+")
    ap.add_argument("--out", default=os.path.join(REPO, "bench_out.json"))
    ap.add_argument("--ratio", type=float, default=1.5)
    # ignore sub-floor times: a 0.05s -> 0.12s flutter is scheduler noise,
    # not a regression (the established run-to-run band is 5-8%)
    ap.add_argument("--floor", type=float, default=0.4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--no-run", action="store_true")
    ap.add_argument("--no-confirm", action="store_true")
    a = ap.parse_args()

    if not a.no_run:
        run_bench(a.out, a.sf)
    # per-query max across baselines: any previously-accepted time passes
    old = {}
    for b in a.baseline:
        for k, v in load(b).items():
            old[k] = max(old.get(k, 0.0), v)
    new = load(a.out)
    shared = sorted(set(old) & set(new))
    if not shared:
        raise SystemExit("no shared queries between baseline and run")

    def over_gate(times):
        return [k for k in shared
                if times[k] > a.ratio * old[k] and times[k] > a.floor]

    confirmed = ""
    if over_gate(new) and not (a.no_run or a.no_confirm):
        print(f"first run flagged {len(over_gate(new))} queries over gate; "
              "re-running once to separate flutter from regression...")
        run_bench(a.out + ".confirm", a.sf)
        new2 = load(a.out + ".confirm")
        # gate on best-of-two; keep the better complete run as the artifact
        merged = {k: min(new[k], new2.get(k, new[k])) for k in shared}
        if sum(new2.get(k, 1e9) for k in shared) < sum(new[k] for k in shared):
            os.replace(a.out + ".confirm", a.out)
        else:
            os.remove(a.out + ".confirm")
        new = merged
        confirmed = ", best-of-2 confirmed"
    allowed = allowlist()
    bad, waived = [], []
    for k in over_gate(new):
        (waived if k in allowed else bad).append(
            f"  {k}: {old[k]:.2f}s -> {new[k]:.2f}s "
            f"({new[k] / old[k]:.2f}x)")
    tot_o, tot_n = sum(old[k] for k in shared), sum(new[k] for k in shared)
    print(f"bench gate: {len(shared)} carried queries, "
          f"{tot_o:.1f}s -> {tot_n:.1f}s ({tot_n / tot_o:.2f}x), "
          f"ratio gate {a.ratio}x, floor {a.floor}s{confirmed}")
    if waived:
        print("allowlisted regressions (intentional):")
        print("\n".join(waived))
    if bad:
        print("REGRESSIONS over gate:")
        print("\n".join(bad))
        print("(add to tools/bench_allowlist.txt only if intentional)")
        sys.exit(1)
    print("PASS: no per-query regression over gate")


if __name__ == "__main__":
    main()
