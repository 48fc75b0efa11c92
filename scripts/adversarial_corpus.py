#!/usr/bin/env python3
"""Generate an adversarial-text corpus for cross-engine determinism
testing: same schemas as the driver fixtures, but documents.text is
drawn from pathological cases (empty/whitespace-only, regex
metacharacters, JSON-breaking quotes/backslashes, very long words,
massive repetition, CJK, accents). Keys/invariants the engine
documents (non-negative ids, post-1970 timestamps, 2dp money) are
respected — the point is hostile CONTENT, not contract violations.

Usage: python3 scripts/adversarial_corpus.py [outdir]
Then:  python3 scripts/check.py <outdir>

Dev tooling only (driver-side python); not part of the Scala library.
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/adversarial_corpus"
SRC = "/root/testdata/sf0.001"

import os
os.makedirs(OUT, exist_ok=True)

# pass through the non-document tables unchanged (small fixture copies)
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]:
    tbl = pq.read_table(f"{SRC}/{t}.parquet")
    pq.write_table(tbl, f"{OUT}/{t}.parquet")

CASES = [
    "",                                     # empty
    "   ",                                  # whitespace only
    "a",                                    # single char
    "the the the the the the the the",      # pure repetition
    'he said "hello" and left',             # double quotes (zip/json paths)
    "back\\slash and \\\" mixed",           # backslashes
    "$^.*+?()[]{}|\\d\\w\\s regex soup",     # regex metacharacters
    "tab\tand\nnewline\rand\fformfeed",     # control whitespace
    "word " * 200,                           # long but regular
    "x" * 5000,                              # one 5k-char token
    "naïve café déjà-vu über señor",         # accents
    "中文 文本 处理 中文 文本",                 # CJK
    "mixed 中文 and english text here",      # mixed scripts
    "ALL CAPS SHOUTING TEXT HERE",           # case handling
    "123 456 789 0 numbers only",            # digits
    "!!! ??? ... ;;; ::: ---",               # punctuation only
    "a b c d e f g h i j k l m n o p",      # all 1-char tokens
    "the quick brown fox jumps over the lazy dog",  # normal control
    "word-with-hyphens and under_scores",    # token boundary cases
    "'single' `backtick` %percent% &amp;",   # more specials
]

langs = ["en", "fr", "es", "de", "zh"]
sources = [f"src{i}" for i in range(20)]
rows = []
for i in range(500):
    text = CASES[i % len(CASES)]
    # vary the tail so duplicates are CASE-level, not row-level
    if i >= len(CASES):
        text = text + (" tail%d" % (i // len(CASES)))
    rows.append({
        "doc_id": i,
        "text": text,
        "lang": langs[i % len(langs)],
        "source": sources[i % len(sources)],
        "n_chars": len(text),
    })

schema = pq.read_schema(f"{SRC}/documents.parquet")
tbl = pa.Table.from_pylist(rows, schema=schema)
pq.write_table(tbl, f"{OUT}/documents.parquet")
print(f"wrote adversarial corpus to {OUT} ({len(rows)} docs, {len(CASES)} case classes)")
