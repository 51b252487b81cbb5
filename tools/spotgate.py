#!/usr/bin/env python3
"""Stratified oracle spot-gate at a GenData scale factor (r8 verdict
item 2): run tools/check_oracle.py over a named query subset and write
a CORRECTNESS-style JSON artifact recording per-query pass/fail.

Usage: python3 tools/spotgate.py <sfDir> <verifyOutDir> <artifact.json> <query ...>
(assumes graft.Verify already wrote <verifyOutDir> for the subset)
"""
import json, re, subprocess, sys, time


def main():
    sf_dir, out_dir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    queries = sys.argv[4:]
    if not queries:
        print("spotgate: no queries given — refusing a vacuous pass",
              file=sys.stderr)
        sys.exit(2)
    results = {}
    # ONE subprocess per query: a heavy oracle (sf10 shingle SQL) can't
    # hold memory across queries or take down the whole gate, and the
    # per-query wall is measurable. Caps keep DuckDB spilling instead
    # of OOM-killing the host.
    import os
    env = dict(os.environ, DUCKDB_MEMORY_LIMIT="48GB",
               DUCKDB_TEMP_DIR="/tmp/duck_spill",
               DUCKDB_MAX_TEMP_SIZE="55GB")
    for q in queries:
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "tools/check_oracle.py", sf_dir, out_dir, q],
            capture_output=True, text=True, env=env)
        wall = time.time() - t0
        out = proc.stdout
        m = re.search(r"PASS (\S+) \((\d+) rows\)", out)
        if m and m.group(1) == q:
            results[q] = {"pass": True, "rows": int(m.group(2)), "err": None,
                          "oracle_sec": round(wall, 1)}
        else:
            m = re.search(r"FAIL (\S+):? ?(.*)", out)
            err = (m.group(2) or "mismatch") if m else \
                (proc.stderr.strip()[-300:] or "no result line")
            results[q] = {"pass": False, "rows": None, "err": err,
                          "oracle_sec": round(wall, 1)}
        print(("PASS" if results[q]["pass"] else "FAIL") +
              f" {q} ({wall:.0f}s)", flush=True)
    n_pass = sum(1 for r in results.values() if r["pass"])
    doc = {"sf_dir": sf_dir, "queries": results,
           "pass": n_pass, "fail": len(results) - n_pass}
    with open(artifact, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"wrote {artifact}: {n_pass}/{len(results)} pass")
    sys.exit(0 if n_pass == len(results) else 1)


if __name__ == "__main__":
    main()
