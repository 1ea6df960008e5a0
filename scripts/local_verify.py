#!/usr/bin/env python3
"""Dev-only mimic of the driver's t2 correctness gate: load each query's
parquet output (written by graft.Verify), run its DuckDB oracle on the same
sf tables, and compare as canonicalized row multisets (columns sorted by
name, rows sorted). Exact equality required — including doubles, which is
what our determinism rules guarantee. Usage:

    python3 scripts/local_verify.py [sfdir] [outdir] [query...]
"""
import json
import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=repr)
    return [c for c in sorted(cols)], out


def norm(v):
    # unify int widths / dates / timestamps to comparable primitives
    import datetime
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return int(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"
    only = set(sys.argv[3:])

    oracle_sql = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    # pin UTC: naive-vs-TZ timestamp comparisons in oracle SQL must not
    # depend on the host's local timezone
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        # driver testdata ships single parquet FILES; scaled scratch data
        # (tools/ScaleData) writes Spark-style DIRECTORIES — glob those
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    import glob
    ok = fail = 0
    try:
        errors = json.load(open(f"{outdir}/_ERRORS.json"))
    except Exception:
        errors = {}
    for name, msg in errors.items():
        if only and name not in only:
            continue
        print(f"FAIL {name}: query threw at dump time: {msg[:200]}")
        fail += 1
    for qdir in sorted(glob.glob(f"{outdir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        if only and name not in only:
            continue
        try:
            mine = con.execute(
                f"SELECT * FROM read_parquet('{qdir}*.parquet')")
            mine_cols = [d[0] for d in mine.description]
            mine_rows = mine.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read my output: {e}")
            fail += 1
            continue
        if name not in oracle_sql:
            print(f"  ok {name}: no oracle (rows={len(mine_rows)})"
                  + ("  ** EMPTY **" if not mine_rows else ""))
            ok += 1
            continue
        try:
            orc = con.execute(oracle_sql[name])
            orc_cols = [d[0] for d in orc.description]
            orc_rows = orc.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fail += 1
            continue
        mc, mr = canon(mine_rows, mine_cols)
        oc, orows = canon(orc_rows, orc_cols)
        if mc != oc:
            print(f"FAIL {name}: column mismatch mine={mc} oracle={oc}")
            fail += 1
            continue
        if mr == orows:
            print(f"  OK {name}: {len(mr)} rows"
                  + ("  ** EMPTY **" if not mr else ""))
            ok += 1
        else:
            fail += 1
            print(f"FAIL {name}: rows mine={len(mr)} oracle={len(orows)}")
            sm, so = set(mr), set(orows)
            for r in list(sm - so)[:3]:
                print(f"    mine-only:   {r}")
            for r in list(so - sm)[:3]:
                print(f"    oracle-only: {r}")
    print(f"== {ok} ok, {fail} fail ==")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
