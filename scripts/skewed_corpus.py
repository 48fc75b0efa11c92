#!/usr/bin/env python3
"""Generate a heavily SKEWED corpus for end-to-end skew validation:
90% of documents in one source and one language, 90% of events on
one user and one type, 50% of lineitem on one order key. This is the
scenario the engine's skew-free designs cite (DistributedNtile's
dominant-language NTILE, token_budget_trim's dominant source, the
salted join's hot key) — run check.py against it to prove
correctness holds, and bench subsets to prove nothing degenerates.

Usage: python3 scripts/skewed_corpus.py [outdir]

Dev tooling only (driver-side python); not part of the Scala library.
"""
import random
import sys
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skewed_corpus"
SRC = "/root/testdata/sf0.01"

import os
os.makedirs(OUT, exist_ok=True)

rng = random.Random(42)

# documents: 90% in (src0, en); text drawn from the real fixture's
# texts so the token machinery does real work
src_docs = pq.read_table(f"{SRC}/documents.parquet").to_pylist()
texts = [d["text"] for d in src_docs]
langs = ["en", "fr", "es", "de", "zh"]
sources = [f"src{i}" for i in range(20)]
rows = []
for i in range(len(src_docs)):
    skewed = rng.random() < 0.9
    text = texts[rng.randrange(len(texts))]
    rows.append({
        "doc_id": i,
        "text": text,
        "lang": "en" if skewed else langs[rng.randrange(1, len(langs))],
        "source": "src0" if skewed else sources[rng.randrange(1, len(sources))],
        "n_chars": len(text),
    })
pq.write_table(
    pa.Table.from_pylist(rows, schema=pq.read_schema(f"{SRC}/documents.parquet")),
    f"{OUT}/documents.parquet")

# events: 90% on user 7 / type 'click'
ev = pq.read_table(f"{SRC}/events.parquet").to_pylist()
for e in ev:
    if rng.random() < 0.9:
        e["user_id"] = 7
        e["event_type"] = "click"
pq.write_table(
    pa.Table.from_pylist(ev, schema=pq.read_schema(f"{SRC}/events.parquet")),
    f"{OUT}/events.parquet")

# lineitem: 50% of rows re-keyed to one hot order
li = pq.read_table(f"{SRC}/lineitem.parquet").to_pylist()
hot = li[0]["l_orderkey"]
for i, r in enumerate(li):
    if rng.random() < 0.5:
        r["l_orderkey"] = hot
        r["l_linenumber"] = i  # keep (orderkey, linenumber) rows distinct
pq.write_table(
    pa.Table.from_pylist(li, schema=pq.read_schema(f"{SRC}/lineitem.parquet")),
    f"{OUT}/lineitem.parquet")

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "embeddings"]:
    pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{OUT}/{t}.parquet")

print(f"wrote skewed corpus to {OUT}: 90% docs->(src0,en), "
      f"90% events->(user 7, click), 50% lineitem->order {hot}")
