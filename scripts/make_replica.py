"""Deterministic scale-replica corpus for threshold-headroom proofs.

The driver ships sf0.001/0.01/0.1; the fixture-tuned monitor constants
(LSH_MONITOR_BUCKET, SHINGLE_MONITOR_DF, the ngram max_df=30 cut, HLL
tolerance) deserve an order-of-magnitude headroom check. This builds a
replica sf directory with ``documents`` and ``embeddings`` replicated
R times under fresh ids (doc_id' = doc_id*R + rep — every oracle is
closed-form in doc_id / recomputed from the table, so ANY id set stays
green by construction) and the other eight tables copied as-is. The
replication multiplies every shingle/band/bucket frequency by R, which
pushes the monitors and caps well past their fixture operating point.

Usage: python scripts/make_replica.py [src_sf_dir] [R] [out_dir]
Then:  python scripts/crosscheck.py <out_dir>
"""

from __future__ import annotations

import os
import sys

import duckdb

COPY_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events",
]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/spark_graft_replica/{os.path.basename(src.rstrip('/'))}_x{r}"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
          SELECT d.doc_id * {r} + rep.i AS doc_id, d.text, d.lang, d.source, d.n_chars
          FROM '{src}/documents.parquet' d, (SELECT unnest(range({r})) AS i) rep
          ORDER BY doc_id
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.sql(
        f"""
        COPY (
          SELECT e.vec_id * {r} + rep.i AS vec_id, e.embedding, e.label
          FROM '{src}/embeddings.parquet' e, (SELECT unnest(range({r})) AS i) rep
          ORDER BY vec_id
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    for t in COPY_TABLES:
        con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
    print(f"{out}: documents={n}")


if __name__ == "__main__":
    main()
