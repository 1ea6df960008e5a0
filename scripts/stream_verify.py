#!/usr/bin/env python3
"""Memory-bounded, resumable oracle check for LARGE scale factors.

local_verify.py fetches both result sets into Python and sorts them —
fine at sf0.01, a 48 GB / multi-hour blowup at sf1 where single queries
emit millions of rows. This verifier never materializes a result set:
each side (my parquet dump, the DuckDB oracle SQL) is reduced INSIDE
DuckDB to an order-independent multiset fingerprint

    (count(*), sum(hash(row)), bit_xor(hash(row)))

over rows canonicalized in SQL (columns in sorted-name order, NULLs
tagged, FLOAT widened to DOUBLE to match the exact-equality semantics
of the strict checker, everything rendered through VARCHAR under a
pinned UTC timezone). Hashing streams: peak memory is the DuckDB
operator budget, not the result size. On a fingerprint mismatch with
small results (<= --diff-cap rows) it falls back to the exact diff for
diagnostics.

Resumable: results append to <out>.partial.jsonl as each query
finishes; a rerun with --resume skips queries already recorded. The
final JSON (driver CORRECTNESS shape) is written at the end from the
partial log.

Usage:
    python3 scripts/stream_verify.py SFDIR OUTDIR --out CORRECTNESS_sf1_r14.json [--resume] [query...]
"""
import argparse
import glob
import json
import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
# DuckDB's memory_limit bounds operator memory (hash tables, sorts the
# oracle SQL itself may need); the streaming fingerprint adds ~nothing.
MEM_LIMIT = os.environ.get("GRAFT_DUCKDB_MEM", "12GB")


def field_expr(col, typ):
    """Canonical VARCHAR rendering of one column, NULL-tagged."""
    base = f'"{col}"'
    t = typ.upper()
    # exact-equality parity with the strict checker: a FLOAT read into
    # Python becomes the exact double of its float32 value, so widen
    # BEFORE rendering (both sides; lossless)
    if t == "FLOAT":
        base = f"CAST({base} AS DOUBLE)"
    elif t == "FLOAT[]":
        base = f"list_transform({base}, x -> CAST(x AS DOUBLE))"
    return (f"CASE WHEN {base} IS NULL THEN 'N' "
            f"ELSE 'V' || CAST({base} AS VARCHAR) END")


def fingerprint(con, src_sql):
    """(cols_sorted, types, count, sum_hash, xor_hash) of a relation."""
    desc = con.execute(
        f"DESCRIBE SELECT * FROM ({src_sql})").fetchall()
    cols = [(r[0], r[1]) for r in desc]
    ordered = sorted(cols, key=lambda c: c[0])
    # per-field hash first, then hash of the joined hashes: a field
    # value containing the join separator cannot forge another row
    fields = ", ".join(
        f"CAST(hash({field_expr(c, t)}) AS VARCHAR)" for c, t in ordered)
    h = f"hash(concat_ws(',', {fields}))"
    n, s, x = con.execute(
        f"SELECT count(*), CAST(sum(h) AS VARCHAR), CAST(bit_xor(h) AS VARCHAR) "
        f"FROM (SELECT {h} AS h FROM ({src_sql}))").fetchone()
    return [c for c, _ in ordered], dict(cols), n, s, x


def exact_diff(con, mine_sql, orc_sql, cap):
    """Small-result diagnostic: first few rows on each side only."""
    try:
        mine = con.execute(mine_sql)
        mcols = sorted(d[0] for d in mine.description)
        mrows = {tuple(repr(v) for v in r) for r in con.execute(
            f"SELECT {', '.join(q(mcols))} FROM ({mine_sql})").fetchall()}
        orows = {tuple(repr(v) for v in r) for r in con.execute(
            f"SELECT {', '.join(q(mcols))} FROM ({orc_sql})").fetchall()}
        return (list(mrows - orows)[:3], list(orows - mrows)[:3])
    except Exception as e:  # diagnostics only — never fail the check here
        return ([f"diff unavailable: {e}"], [])


def q(cols):
    return [f'"{c}"' for c in cols]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sfdir")
    ap.add_argument("outdir")
    ap.add_argument("--out", default="CORRECTNESS_stream.json")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--diff-cap", type=int, default=100_000)
    ap.add_argument("queries", nargs="*")
    a = ap.parse_args()

    con = duckdb.connect()
    con.execute(f"SET memory_limit='{MEM_LIMIT}'")
    con.execute("SET TimeZone='UTC'")
    con.execute(f"SET temp_directory='{os.path.abspath(a.outdir)}/.duck_tmp'")
    for t in TABLES:
        p = f"{a.sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle_sql = json.load(open(f"{a.outdir}/oracle_sql.json"))
    try:
        dump_errors = json.load(open(f"{a.outdir}/_ERRORS.json"))
    except Exception:
        dump_errors = {}

    partial = a.out + ".partial.jsonl"
    done = {}
    if a.resume and os.path.exists(partial):
        with open(partial) as f:
            for line in f:
                rec = json.loads(line)
                done[rec.pop("name")] = rec
        print(f"[resume] {len(done)} queries already recorded")
    plog = open(partial, "a" if a.resume else "w")

    only = set(a.queries)
    names = sorted(n.rstrip("/").split("/")[-1]
                   for n in glob.glob(f"{a.outdir}/*/"))
    names = [n for n in names if not n.startswith(".")]
    ok = fail = 0
    results = dict(done)
    for name, msg in dump_errors.items():
        results[name] = {"rows_match": False, "schema_match": False,
                         "hash_match": False, "spark_rows": 0,
                         "oracle_rows": 0, "err": f"dump-time: {msg[:300]}"}
    for name in names:
        if only and name not in only:
            continue
        if name in done:
            continue
        mine_sql = (f"SELECT * FROM read_parquet("
                    f"'{a.outdir}/{name}/*.parquet')")
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": 0, "oracle_rows": 0,
               "err": None}
        try:
            if name not in oracle_sql:
                n = con.execute(f"SELECT count(*) FROM ({mine_sql})"
                                ).fetchone()[0]
                rec.update(rows_match=n > 0, schema_match=True,
                           hash_match=n > 0, spark_rows=n, oracle_rows=n,
                           err=None if n else "no oracle and EMPTY")
            else:
                mc, _, mn, ms, mx = fingerprint(con, mine_sql)
                oc, _, on, os_, ox = fingerprint(con, oracle_sql[name])
                rec["spark_rows"], rec["oracle_rows"] = mn, on
                rec["rows_match"] = mn == on
                rec["schema_match"] = mc == oc
                rec["hash_match"] = (mc == oc and mn == on
                                     and ms == os_ and mx == ox)
                if not rec["schema_match"]:
                    rec["err"] = f"columns mine={mc} oracle={oc}"
                elif not rec["hash_match"] and mn <= a.diff_cap \
                        and on <= a.diff_cap:
                    m_only, o_only = exact_diff(
                        con, mine_sql, oracle_sql[name], a.diff_cap)
                    rec["err"] = (f"mine-only={m_only[:2]} "
                                  f"oracle-only={o_only[:2]}")[:500]
        except Exception as e:
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
        results[name] = rec
        plog.write(json.dumps({"name": name, **rec}) + "\n")
        plog.flush()
        good = rec["hash_match"]
        ok += 1 if good else 0
        fail += 0 if good else 1
        print(("  OK " if good else "FAIL ")
              + f"{name}: {rec['spark_rows']} rows"
              + (f"  [{rec['err']}]" if rec["err"] else ""))
    for n, r in done.items():
        if r["hash_match"]:
            ok += 1
        else:
            fail += 1
    plog.close()
    with open(a.out, "w") as f:
        json.dump(dict(sorted(results.items())), f, indent=2)
    print(f"== {ok} ok, {fail} fail -> {a.out} ==")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
