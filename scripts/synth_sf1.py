#!/usr/bin/env python3
"""Synthesize an sf1-EQUIVALENT testdata directory from sf0.1.

Build tooling for the fourth scaling point (SCALING.md): the driver
only ships sf0.001/0.01/0.1, so the next decade is synthesized locally
as a DOCUMENTED-synthetic 10x key-remapped duplication of sf0.1.
Never writes into /root/testdata (read-only contract) — output goes to
a caller-chosen directory (default /tmp/testdata_sf1).

Remapping rules (copy index i in 0..9, copy 0 bit-identical):
  - fact/dim keys shift by i * (max_key + 1) per key family, so FK
    integrity (orders->customer, lineitem->orders/part/supplier,
    events.user_id->customer) holds within every copy;
  - region/nation stay single copies (true dimension tables — a 10x
    corpus does not get 10x regions);
  - documents: copy 0 keeps its text; copies i>0 Caesar-rotate the
    LETTERS of every word by the copy index (translate(), digits/
    punct/whitespace untouched). Word lengths, token boundaries and
    n_chars are preserved EXACTLY — so a GPT-2-style pre-tokenizer
    produces the identical piece count per copy (the previous
    word-suffix remap split every letter-run+digit into two pieces
    and inflated x_token_count_bpe's sf1 ratio to a false 13.7x
    flag) — while copies stay textually unrelated: exact/near-dup
    structure per copy matches the original instead of every doc
    gaining 9 near-identical clones (which would turn the dedup
    tier's pair counts super-linear by DATA construction, not by
    plan defect), and BM25/TF-IDF get the vocabulary growth of
    genuinely new shards;
  - embeddings: copies i>0 apply a deterministic per-(copy, dim) sign
    flip — norms, per-dim magnitudes and pairwise-similarity
    distributions are preserved exactly while copies stay mutually
    unrelated (no artificial 10-clone ANN ties). The flip is the
    parity of DuckDB's 64-bit hash(i*4096 + d): a plain
    linear-combination parity like (i*31 + d*17) % 2 collapses to
    (i+d) % 2 whenever both coefficients are odd (bit-identical
    clones across all odd copies), and even a divide-then-parity mix
    (//7) keeps linear structure (copies i and i+7 come out exact
    complements, i and i+3 nearly identical -> cosine ~0.7 ties);
    measured hash-parity flip patterns sit at pairwise Hamming
    114-147 of 256 dims, i.e. cross-copy cosine ~0.

Deterministic end to end (no RNG). DuckDB does the rewriting; output
parquet keeps the driver schema (int64 keys, timestamp[us] ts,
list<float4> embeddings, int32 label).
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata_sf1"
COPIES = int(os.environ.get("SYNTH_COPIES", "10"))

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def src(t):
    return f"'{SRC}/{t}.parquet'"


def write(t, sql):
    out = f"{DST}/{t}.parquet"
    con.sql(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"{t}: {n} rows")


def stride(table, key):
    return con.sql(f"SELECT max({key}) + 1 FROM {src(table)}").fetchone()[0]


SO = stride("orders", "o_orderkey")
SC = stride("customer", "c_custkey")
SS = stride("supplier", "s_suppkey")
SP = stride("part", "p_partkey")
SD = stride("documents", "doc_id")
SV = stride("embeddings", "vec_id")
SE = stride("events", "event_id")

copies = f"(SELECT unnest(range({COPIES})) AS i)"

# true dims: single copy
for t in ("region", "nation"):
    write(t, f"SELECT * FROM {src(t)}")

write("customer", f"""
  SELECT c_custkey + i*{SC} AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment
  FROM {src('customer')}, {copies}""")

write("supplier", f"""
  SELECT s_suppkey + i*{SS} AS s_suppkey, * EXCLUDE (s_suppkey)
  FROM {src('supplier')}, {copies}""")

write("part", f"""
  SELECT p_partkey + i*{SP} AS p_partkey, * EXCLUDE (p_partkey)
  FROM {src('part')}, {copies}""")

write("orders", f"""
  SELECT o_orderkey + i*{SO} AS o_orderkey, o_custkey + i*{SC} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}, {copies}""")

write("lineitem", f"""
  SELECT l_orderkey + i*{SO} AS l_orderkey, l_partkey + i*{SP} AS l_partkey,
         l_suppkey + i*{SS} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM {src('lineitem')}, {copies}""")

write("events", f"""
  SELECT event_id + i*{SE} AS event_id, ts, user_id + i*{SC} AS user_id,
         event_type, value, props
  FROM {src('events')}, {copies}""")

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()


def rot(s, i):
    return s[i:] + s[:i]


# per-copy letter rotation tables (copy 0 unused — identity)
rot_cases = " ".join(
    f"WHEN i = {i} THEN translate(text, '{LOWER + UPPER}', "
    f"'{rot(LOWER, i) + rot(UPPER, i)}')"
    for i in range(1, COPIES)
)

write("documents", f"""
  SELECT doc_id + i*{SD} AS doc_id,
         CASE WHEN i = 0 THEN text {rot_cases} ELSE text END AS text,
         lang, source, n_chars
  FROM {src('documents')}, {copies}""")

write("embeddings", f"""
  WITH exploded AS (
    SELECT e.vec_id, e.label, c.i,
           generate_subscripts(e.embedding, 1) AS d,
           unnest(e.embedding) AS v
    FROM {src('embeddings')} e, {copies} c)
  SELECT vec_id + i*{SV} AS vec_id,
         list(CAST(CASE WHEN i = 0 THEN v
                        ELSE v * (CAST(hash(i*4096 + d) % 2 AS BIGINT)*2 - 1)
                   END AS FLOAT4) ORDER BY d) AS embedding,
         label
  FROM exploded
  GROUP BY vec_id + i*{SV}, label
""")

print(f"wrote {DST} ({COPIES}x {SRC})")
