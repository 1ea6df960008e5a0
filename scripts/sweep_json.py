#!/usr/bin/env python3
"""Run scripts/local_verify.py over a Verify dump and write the
cross-scale correctness artifact (CORRECTNESS_sf01_r{N}.json shape).

Usage: python3 scripts/sweep_json.py <sfdir> <outdir> <round> <artifact> [note]
"""
import json
import re
import subprocess
import sys


def main():
    sfdir, outdir, rnd, artifact = sys.argv[1:5]
    note = sys.argv[5] if len(sys.argv) > 5 else ""
    p = subprocess.run(
        [sys.executable, "scripts/local_verify.py", sfdir, outdir],
        capture_output=True, text=True)
    queries = {}
    ok = fail = 0
    for line in p.stdout.splitlines():
        m = re.match(r"\s+OK (\S+): (\d+) rows", line)
        if m:
            queries[m.group(1)] = {"status": "hash_match",
                                   "rows": int(m.group(2))}
            ok += 1
            continue
        m = re.match(r"\s+ok (\S+): no oracle \(rows=(\d+)\)", line)
        if m:
            queries[m.group(1)] = {"status": "rows_only",
                                   "rows": int(m.group(2))}
            ok += 1
            continue
        m = re.match(r"FAIL (\S+): (.*)", line)
        if m:
            queries[m.group(1)] = {"status": "FAIL",
                                   "detail": m.group(2)[:300]}
            fail += 1
    out = {
        "round": int(rnd),
        "sf_dir": sfdir,
        "note": note,
        "summary": {"ok": ok, "fail": fail},
        "queries": dict(sorted(queries.items())),
    }
    with open(artifact, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {artifact}: {ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
