#!/usr/bin/env python3
"""Generate the null-injected corpus for cross-engine ORACLE-EQUALITY
testing: same tables as the driver fixtures, but ~a third of every
NON-KEY column is NULL (rows where the table's key % 3 == 0). This is
the exact injection NullInputSpec applies for its crash-only sweep —
materialized to parquet so check.py can hash-compare engine vs DuckDB
on the same null-ridden input (VERDICT r10 item 4: the asc_nulls_last
NTILE/running-sum fix had no oracle-equality regression test).

Usage: python3 scripts/null_corpus.py [outdir]
Then:  python3 scripts/check.py <outdir> <outdir>/verify_out \
           ccnet_buckets curriculum_schedule auc_eval ks_test \
           hist_equidepth iqr_outliers gini_concentration \
           group_quantiles token_budget_trim

Dev tooling only (driver-side python); not part of the Scala library.
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/null_corpus"
SRC = "/root/testdata/sf0.001"

import os
os.makedirs(OUT, exist_ok=True)

# mirrors NullInputSpec: the key column driving the injection per
# table, and the column set never nulled (keys are a data contract;
# attributes are Tuesday)
KEY_COL = {
    "events": "event_id", "documents": "doc_id", "embeddings": "vec_id",
    "region": "r_regionkey", "nation": "n_nationkey",
    "customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
    "orders": "o_orderkey", "lineitem": "l_orderkey",
}
KEY_NAMES = {
    "event_id", "doc_id", "vec_id", "r_regionkey", "n_nationkey",
    "c_custkey", "s_suppkey", "p_partkey", "o_orderkey", "l_orderkey",
    "l_linenumber", "user_id", "o_custkey", "l_partkey", "l_suppkey",
    "c_nationkey", "s_nationkey", "n_regionkey", "ts",
}

for t, key in KEY_COL.items():
    tbl = pq.read_table(f"{SRC}/{t}.parquet")
    keys = tbl[key].combine_chunks()
    mask = pa.array([v is not None and v % 3 == 0 for v in keys.to_pylist()])
    cols = []
    for name in tbl.column_names:
        col = tbl[name].combine_chunks()
        if name in KEY_NAMES:
            cols.append(col)
            continue
        nulls = pa.nulls(len(tbl), type=col.type)
        try:
            cols.append(pc.if_else(mask, nulls, col))
        except pa.ArrowNotImplementedError:
            # nested types (list<float> embeddings): python fallback
            cols.append(pa.array(
                [None if m else v
                 for m, v in zip(mask.to_pylist(), col.to_pylist())],
                type=col.type))
    out = pa.Table.from_arrays(cols, schema=tbl.schema)
    pq.write_table(out, f"{OUT}/{t}.parquet")
    n_null = mask.to_pylist().count(True)
    print(f"{t}: {len(tbl)} rows, {n_null} null-injected")
print(f"wrote null-injected corpus to {OUT}")
