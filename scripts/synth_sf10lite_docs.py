#!/usr/bin/env python3
"""Synthesize an sf10-LITE testdata directory (documents + events ONLY)
from the synthetic sf1 — the third local decade for the text/media
headline-tail scaling checks (r17 task #4 media classes; r18 task #6
extends the decade to the documents-tier headline tail).

Same remix rules as scripts/synth_sf1.py: doc_id/event_id/user_id shift
by copy * stride (so media_type = doc_id % 3 re-shuffles per copy,
exactly the mechanism that grew classes on the first synthetic decade,
and per-copy user populations stay disjoint), and document copies i>0
Caesar-rotate the letters per copy (lengths, spaces, digits — i.e.
every media feature input, word boundary and pre-tokenizer piece count
— preserved exactly). Only documents and events are produced: the
text/media tail queries read nothing else, and the sweep runs with
SPARK_GRAFT_STAGE=0 and SPARK_GRAFT_ONLY=<query>.

Usage: synth_sf10lite_docs.py [src=/tmp/testdata_sf1] [dst=/tmp/testdata_sf10lite]
"""
import os
import string
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata_sf10lite"
COPIES = int(os.environ.get("SYNTH_COPIES", "10"))

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

src = f"'{SRC}/documents.parquet'"
stride = con.sql(f"SELECT max(doc_id) + 1 FROM {src}").fetchone()[0]
copies = f"(SELECT unnest(range({COPIES})) AS i)"

lower = string.ascii_lowercase
upper = string.ascii_uppercase


def rot(s, i):
    return s[i:] + s[:i]


rot_cases = " ".join(
    f"WHEN i = {i} THEN translate(text, '{lower}{upper}', "
    f"'{rot(lower, i)}{rot(upper, i)}')"
    for i in range(1, COPIES)
)

con.sql(f"""
  COPY (
    SELECT doc_id + i*{stride} AS doc_id,
           CASE WHEN i = 0 THEN text {rot_cases} ELSE text END AS text,
           lang, source, n_chars
    FROM {src}, {copies}
  ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
""")
n = con.sql(f"SELECT count(*) FROM '{DST}/documents.parquet'").fetchone()[0]
print(f"wrote {DST}/documents.parquet ({n} docs = {COPIES}x {SRC})")

# events: the synth_sf1 rule (key-shift per copy; ts/type/value/props
# bit-identical per copy). user stride from events' own population —
# the lite dir carries no customer table, and what the event-tier
# queries need is per-copy user disjointness, not the FK endpoint.
esrc = f"'{SRC}/events.parquet'"
se = con.sql(f"SELECT max(event_id) + 1 FROM {esrc}").fetchone()[0]
su = con.sql(f"SELECT max(user_id) + 1 FROM {esrc}").fetchone()[0]
con.sql(f"""
  COPY (
    SELECT event_id + i*{se} AS event_id, ts, user_id + i*{su} AS user_id,
           event_type, value, props
    FROM {esrc}, {copies}
  ) TO '{DST}/events.parquet' (FORMAT PARQUET)
""")
n = con.sql(f"SELECT count(*) FROM '{DST}/events.parquet'").fetchone()[0]
print(f"wrote {DST}/events.parquet ({n} events = {COPIES}x {SRC})")
