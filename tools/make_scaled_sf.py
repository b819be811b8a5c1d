"""Synthesize a larger scale factor from /root/testdata/sf0.1 for the
LOCAL scale experiment (VERDICT r7 task 3) — testdata is read-only and
ships no sf1, so the scale points are derived, never used for
correctness (oracles stay on the driver-generated dirs).

Construction: N replicas of every table with per-replica key offsets
(stride = table's key range) so joins stay consistent and
cardinalities scale like a real TPC-H scale-up (more customers, more
orders, same dims-to-facts ratios; region/nation stay fixed like
TPC-H). Two tables need more than an id shift:

- documents: replica r > 0 suffixes EVERY token with ``q{r}``. The
  map is a bijection on tokens, so within-replica shingle sets,
  Jaccard similarities, MinHash collision structure, and the
  truncated-twin relation are EXACTLY the original's — while
  cross-replica shingle overlap is zero. A plain text copy would make
  every doc a 10-way exact duplicate and quadratically inflate the
  dedup families' pair counts — measuring that would say nothing
  about real 10x growth, where new documents are mostly novel.
- embeddings: replica vectors get small deterministic per-replica
  noise (seeded by replica and vec_id), so near-dup/ANN candidate
  structure scales like a corpus that grew, not like one that was
  copied.

Usage::

    python tools/make_scaled_sf.py --out /tmp/sfscale/sf1 --replicas 10
    python tools/make_scaled_sf.py --out /tmp/sfscale/sf0.3 --replicas 3
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# table -> {column: stride} (stride = sf0.1 key range, keys disjoint
# per replica). documents' stride of 5_000 stays far under the dedup
# twin offset (100_000) even at 10 replicas.
OFFSETS = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 150_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    "events": {"event_id": 100_000, "user_id": 15_000},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
COPY_ONLY = ("region", "nation")


def _replicated_sql(table: str, replicas: int) -> str:
    cols = [
        c[0]
        for c in duckdb.sql(
            f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'"
        ).fetchall()
    ]
    parts = []
    for r in range(replicas):
        sel = []
        for c in cols:
            off = OFFSETS.get(table, {}).get(c)
            if off is not None and r > 0:
                sel.append(f"{c} + {off * r} AS {c}")
            elif table == "documents" and c == "text" and r > 0:
                sel.append(
                    f"regexp_replace(text, '(\\S+)', '\\1q{r}', 'g')"
                    f" AS text"
                )
            elif table == "documents" and c == "n_chars" and r > 0:
                # keep the length column consistent with the salted text
                sel.append(
                    f"CAST(length(regexp_replace(text, '(\\S+)', "
                    f"'\\1q{r}', 'g')) AS BIGINT) AS n_chars"
                )
            else:
                sel.append(c)
        parts.append(
            f"SELECT {', '.join(sel)} FROM '{SRC}/{table}.parquet'"
        )
    return " UNION ALL ".join(parts)


def _write_embeddings(out_dir: str, replicas: int) -> None:
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
    vid = tbl["vec_id"].to_numpy()
    lab = tbl["label"].to_numpy()
    outs = []
    for r in range(replicas):
        if r == 0:
            v = vec
        else:
            # sigma = 0.12 on unit-norm dim-64 vectors puts a replica
            # copy at cosine ~0.72 to its source — clearly OUTSIDE the
            # 0.97 near-dup threshold (sigma = 0.02 left copies at
            # ~0.99, making every vector a 10-way near-dup and the
            # first scale run's embedding_neardup output 776x instead
            # of 10x). Renormalize so the distribution stays unit-norm.
            rng = np.random.default_rng(10_000 + r)
            v = vec + rng.normal(0.0, 0.12, size=vec.shape).astype(
                np.float32
            )
            v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(
                np.float32
            )
        outs.append(
            pa.table(
                {
                    "vec_id": pa.array(vid + r * 2_000, pa.int64()),
                    "embedding": pa.array(
                        list(v), pa.list_(pa.float32())
                    ),
                    "label": pa.array(lab, pa.int32()),
                }
            )
        )
    pq.write_table(
        pa.concat_tables(outs), f"{out_dir}/embeddings.parquet"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--replicas", type=int, required=True)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for t in COPY_ONLY:
        duckdb.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in OFFSETS:
        if t == "embeddings":
            continue
        duckdb.sql(
            f"COPY ({_replicated_sql(t, args.replicas)}) TO "
            f"'{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
    _write_embeddings(args.out, args.replicas)
    for t in list(OFFSETS) + list(COPY_ONLY):
        n = duckdb.sql(
            f"SELECT count(*) FROM '{args.out}/{t}.parquet'"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
