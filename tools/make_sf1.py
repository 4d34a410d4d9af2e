"""Materialize the sf1 BENCH dataset (10x sf0.1) under <repo>/.bench_sf1.

The driver generates sf0.001/0.01/0.1 only; at sf0.1 most headline
queries are 60-80% fixed overhead (SCALE.md's dp_exact_dedup
adjudication measured a 0.055 s floor on a 0.19 s query), so the bench
guard's ratios mostly track driver/JIT state. This derived 10x replica
gives the guard a second scale point where compute dominates. It is a
BENCH-ONLY artifact (gitignored, regenerated deterministically, seed
fixed) — correctness stays on the driver's own parquet.

Scaling rules — each preserves the workload SHAPE, not just row count:

- events: 10 copies, ``event_id`` offset per copy (unique ids); ts /
  user / value / props reused, so time-filter selectivity and group
  cardinality-per-row match sf0.1.
- TPC-H: 10 copies with per-domain key offsets applied CONSISTENTLY on
  both sides of every join (orderkey/custkey/partkey/suppkey), so join
  fan-outs are unchanged; nation/region stay fixed (TPC-H scales them
  as constants too).
- documents: copy 0 is sf0.1 verbatim; copy k>0 suffixes EVERY word
  with a copy letter. Internal duplicate/near-duplicate structure is
  preserved within each copy (dedup/minhash/span workloads keep their
  match rate) while no shingle ever matches across copies (a naive 10x
  replica would make every doc a 10-way dup and blow the pair stages
  into a different workload).
- embeddings: copy 0 verbatim; copy k>0 applies a seeded coordinate
  permutation — norms and within-copy pairwise cosines are EXACTLY
  preserved (internal near-dup structure intact), cross-copy cosines
  scramble to the random-vector baseline.

Usage: python tools/make_sf1.py [--src /root/testdata/sf0.1] [--dst DIR]
"""

from __future__ import annotations

import os
import sys

COPIES = 10
SEED = 1301


def arg(flag: str, default: str) -> str:
    return sys.argv[sys.argv.index(flag) + 1] if flag in sys.argv else default


def main() -> int:
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = arg("--src", "/root/testdata/sf0.1")
    dst = arg("--dst", os.path.join(repo, ".bench_sf1"))
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def rd(t: str) -> str:
        return f"read_parquet('{src}/{t}.parquet')"

    def write(t: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{dst}/{t}.parquet'"
            " (FORMAT PARQUET, COMPRESSION ZSTD)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"# {t}: {n} rows", file=sys.stderr)

    # key-domain strides: max+1 so offset copies never collide
    def stride(t: str, col: str) -> int:
        return con.execute(f"SELECT MAX({col}) + 1 FROM {rd(t)}").fetchone()[0]

    d_ev = stride("events", "event_id")
    d_ord = stride("orders", "o_orderkey")
    d_cust = stride("customer", "c_custkey")
    d_part = stride("part", "p_partkey")
    d_supp = stride("supplier", "s_suppkey")

    copies = f"(SELECT UNNEST(range({COPIES})) AS k)"
    write("events",
          f"SELECT event_id + k * {d_ev} AS event_id, ts, user_id,"
          f" event_type, value, props FROM {rd('events')} CROSS JOIN {copies}")
    write("orders",
          f"SELECT o_orderkey + k * {d_ord} AS o_orderkey,"
          f" o_custkey + k * {d_cust} AS o_custkey, o_orderstatus,"
          f" o_totalprice, o_orderdate, o_orderpriority"
          f" FROM {rd('orders')} CROSS JOIN {copies}")
    write("lineitem",
          f"SELECT l_orderkey + k * {d_ord} AS l_orderkey,"
          f" l_partkey + k * {d_part} AS l_partkey,"
          f" l_suppkey + k * {d_supp} AS l_suppkey, l_linenumber,"
          f" l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,"
          f" l_linestatus, l_shipdate FROM {rd('lineitem')} CROSS JOIN {copies}")
    write("customer",
          f"SELECT c_custkey + k * {d_cust} AS c_custkey, c_name,"
          f" c_nationkey, c_acctbal, c_mktsegment"
          f" FROM {rd('customer')} CROSS JOIN {copies}")
    write("part",
          f"SELECT p_partkey + k * {d_part} AS p_partkey, p_name, p_brand,"
          f" p_type, p_size, p_retailprice"
          f" FROM {rd('part')} CROSS JOIN {copies}")
    write("supplier",
          f"SELECT s_suppkey + k * {d_supp} AS s_suppkey, s_name,"
          f" s_nationkey, s_acctbal FROM {rd('supplier')} CROSS JOIN {copies}")
    for t in ("nation", "region"):
        write(t, f"SELECT * FROM {rd(t)}")

    # documents: per-copy word suffixing (python — word-level VARCHAR
    # surgery is clearer here than SQL; 5k docs x 10 is trivial)
    docs = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars FROM {rd('documents')}"
        " ORDER BY doc_id"
    ).fetchall()
    d_doc = max(r[0] for r in docs) + 1
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for k in range(COPIES):
        tag = "" if k == 0 else chr(ord("a") + k - 1)
        for doc_id, text, lang, source, n_chars in docs:
            t = text if not tag else " ".join(
                w + tag for w in text.split(" ")
            )
            out["doc_id"].append(doc_id + k * d_doc)
            out["text"].append(t)
            out["lang"].append(lang)
            out["source"].append(source)
            out["n_chars"].append(len(t))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "text": pa.array(out["text"], pa.string()),
                "lang": pa.array(out["lang"], pa.string()),
                "source": pa.array(out["source"], pa.string()),
                "n_chars": pa.array(out["n_chars"], pa.int64()),
            }
        ),
        f"{dst}/documents.parquet", compression="zstd",
    )
    print(f"# documents: {len(out['doc_id'])} rows", file=sys.stderr)

    # embeddings: per-copy seeded coordinate permutation
    emb = con.execute(
        f"SELECT vec_id, embedding, label FROM {rd('embeddings')}"
        " ORDER BY vec_id"
    ).fetchall()
    d_vec = max(r[0] for r in emb) + 1
    dim = len(emb[0][1])
    rng = np.random.default_rng(SEED)
    vec_ids, vecs, labels = [], [], []
    for k in range(COPIES):
        perm = np.arange(dim) if k == 0 else rng.permutation(dim)
        for vec_id, v, label in emb:
            vec_ids.append(vec_id + k * d_vec)
            vecs.append(np.asarray(v, np.float32)[perm])
            labels.append(label)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(vec_ids, pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        f"{dst}/embeddings.parquet", compression="zstd",
    )
    print(f"# embeddings: {len(vec_ids)} rows", file=sys.stderr)
    print(dst)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
