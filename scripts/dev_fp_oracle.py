#!/usr/bin/env python3
"""Dev harness: build the DuckDB SQL mirror of fnv1a/mix64/fingerprint64/
simhash64 and check it against the Spark dump in target/verify_out."""
import duckdb

SF = "/root/testdata/sf0.01"
P64 = 1 << 64

con = duckdb.connect()
con.execute(
    f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")

TOK = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

# --- helpers that expand to plain-SQL text (HUGEINT unsigned domain [0,2^64)) ---
def u(x):   # signed BIGINT expr -> unsigned HUGEINT
    return (f"(CASE WHEN ({x}) < 0 THEN CAST(({x}) AS HUGEINT) + 18446744073709551616 "
            f"ELSE CAST(({x}) AS HUGEINT) END)")

def s(x):   # unsigned HUGEINT [0,2^64) -> signed BIGINT
    return (f"(CASE WHEN ({x}) >= 9223372036854775808 "
            f"THEN CAST(({x}) - 18446744073709551616 AS BIGINT) "
            f"ELSE CAST(({x}) AS BIGINT) END)")

def xor64(a, b):  # both unsigned HUGEINT exprs -> unsigned HUGEINT
    return u(f"xor({s(a)}, {s(b)})")

def wrapmul(a, c):  # a: unsigned HUGEINT expr, c: python int constant
    lo, hi = c % (1 << 32), c >> 32
    return (f"((({a}) * {lo} + ((({a}) % 4294967296) * {hi}) % 4294967296 "
            f"* 4294967296) % 18446744073709551616)")

FNV_OFFSET = 0xcbf29ce484222325
FNV_PRIME = 0x100000001b3
GOLD = 0x9e3779b97f4a7c15
C2 = 0xbf58476d1ce4e5b9
C3 = 0x94d049bb133111eb

# fnv1a over an ASCII token t (inside a lambda): reduce over char codes.
# xor with a byte only touches the low 8 bits: h - h%256 + xor(h%256, b).
def fnv1a(tok):
    low_xor = u("xor(" + s("h % 256") + ", " + s("b") + ")")
    step = wrapmul("h - h % 256 + " + low_xor, FNV_PRIME)
    return (f"list_reduce(list_prepend(CAST({FNV_OFFSET} AS HUGEINT), "
            f"list_transform(string_split({tok}, ''), c -> CAST(ascii(c) AS HUGEINT))), "
            f"(h, b) -> {step})")

# mix64 staged over CTE columns z0 -> out (columns za, xa, zb, xb, zc)
MIX64_STAGES = [
    ("za", f"((z0 + {GOLD}) % 18446744073709551616)"),
    ("xa", xor64("za", "za // 1073741824")),           # z ^ (z >>> 30)
    ("zb", wrapmul("xa", C2)),
    ("xb", xor64("zb", "zb // 134217728")),            # z ^ (z >>> 27)
    ("zc", wrapmul("xb", C3)),
    ("out", xor64("zc", "zc // 2147483648")),          # z ^ (z >>> 31)
]

def mix_ctes(src, prefix):
    ctes = []
    prev = src
    for name, expr_ in MIX64_STAGES:
        alias = f"{prefix}_{name}"
        e = expr_.replace("z0", "z0").replace("za", "za").replace("zb", "zb") \
                 .replace("xa", "xa").replace("xb", "xb").replace("zc", "zc")
        ctes.append((alias, prev, name, e))
        prev = alias
    return ctes

# ---------------- fingerprint64 ----------------
# acc = reduce(tokens, (h, t) -> h * GOLD + fnv1a(t)) starting at FNV_OFFSET
ACC = (f"list_reduce(list_prepend(CAST({FNV_OFFSET} AS HUGEINT), "
       f"list_transform({TOK}, t -> {fnv1a('t')})), "
       f"(h, t) -> ({wrapmul('h', GOLD)} + t) % 18446744073709551616)")

fp_sql = f"""
WITH f0 AS (SELECT doc_id, {ACC} AS z0 FROM documents),
f1 AS (SELECT doc_id, z0, {MIX64_STAGES[0][1]} AS za FROM f0),
f2 AS (SELECT doc_id, za, {MIX64_STAGES[1][1]} AS xa FROM f1),
f3 AS (SELECT doc_id, xa, {MIX64_STAGES[2][1]} AS zb FROM f2),
f4 AS (SELECT doc_id, zb, {MIX64_STAGES[3][1]} AS xb FROM f3),
f5 AS (SELECT doc_id, xb, {MIX64_STAGES[4][1]} AS zc FROM f4),
f6 AS (SELECT doc_id, zc, {MIX64_STAGES[5][1]} AS fpu FROM f5)
SELECT doc_id, {s('fpu')} AS fp FROM f6 ORDER BY doc_id
"""

mine = con.execute(
    "SELECT doc_id, fp FROM read_parquet('target/verify_out/ext_text_fingerprint/*.parquet') ORDER BY doc_id"
).fetchall()
theirs = con.execute(fp_sql).fetchall()
bad = [(a, b) for a, b in zip(mine, theirs) if a != b]
print(f"fp: {len(mine)} rows, mismatches: {len(bad)}")
for a, b in bad[:5]:
    print("  spark:", a, " duckdb:", b)

# ---------------- simhash64 ----------------
# per (doc, token): h = mix64(fnv1a(token)); votes per bit; sign -> bit
sim_sql = f"""
WITH tk AS (SELECT doc_id, unnest({TOK}) AS tok FROM documents),
h0 AS (SELECT doc_id, {fnv1a('tok')} AS z0 FROM tk),
h1 AS (SELECT doc_id, z0, {MIX64_STAGES[0][1]} AS za FROM h0),
h2 AS (SELECT doc_id, za, {MIX64_STAGES[1][1]} AS xa FROM h1),
h3 AS (SELECT doc_id, xa, {MIX64_STAGES[2][1]} AS zb FROM h2),
h4 AS (SELECT doc_id, zb, {MIX64_STAGES[3][1]} AS xb FROM h3),
h5 AS (SELECT doc_id, xb, {MIX64_STAGES[4][1]} AS zc FROM h4),
h6 AS (SELECT doc_id, zc, {MIX64_STAGES[5][1]} AS h FROM h5),
bits AS (SELECT unnest(range(0, 64)) AS b),
votes AS (
  SELECT doc_id, b,
    sum(CASE WHEN (h // CAST(2.0 ** b AS HUGEINT)) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM h6 CROSS JOIN bits GROUP BY doc_id, b),
fps AS (
  SELECT doc_id,
    coalesce(sum(CASE WHEN v > 0 THEN CAST(2.0 ** b AS HUGEINT) ELSE 0 END), 0) AS fpu
  FROM votes GROUP BY doc_id)
SELECT d.doc_id, {s('coalesce(f.fpu, 0)')} AS simhash
FROM documents d LEFT JOIN fps f ON d.doc_id = f.doc_id ORDER BY d.doc_id
"""

mine2 = con.execute(
    "SELECT doc_id, simhash FROM read_parquet('target/verify_out/ext_text_fingerprint/*.parquet') ORDER BY doc_id"
).fetchall()
theirs2 = con.execute(sim_sql).fetchall()
bad2 = [(a, b) for a, b in zip(mine2, theirs2) if a != b]
print(f"simhash: {len(mine2)} rows, mismatches: {len(bad2)}")
for a, b in bad2[:5]:
    print("  spark:", a, " duckdb:", b)
