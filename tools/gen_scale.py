#!/usr/bin/env python3
"""Scale-up fixture generator: build an sfN directory from sf0.1 by
deterministic key-offset replication (default 10 copies ~= sf1).

Dev-side tool (duckdb/pyarrow are driver-side only — the engine never
reads this). Used for the scaling probe recorded in SCALE.md: bench
the SAME queries at 10x the rows and check nothing goes superlinear.

Design: each copy i offsets every key family by i * stride(family) so
intra-copy join relationships (orders->customer, lineitem->orders/
part/supplier, events sessions per user) are preserved exactly and
cross-copy keys never collide. Distribution-shaping rules:
  - documents: copy i>0 appends a copy tag token to the text, so the
    planted exact/near-dup group structure repeats PER COPY instead of
    collapsing into 10-way cross-copy duplicate groups (which would
    grow pair outputs quadratically and misrepresent the workload).
    doc_id stride is a multiple of 10 to preserve the doc_id % 10
    replay proportions some queries select on.
  - embeddings: copy i applies a seeded SIGNED COORDINATE PERMUTATION
    (numpy RandomState(i): shuffle + Rademacher sign flips). An
    orthogonal transform preserves norms and every within-copy cosine
    exactly, so WITHIN-copy pair structure scales exactly linearly,
    while cross-copy cosines collapse to ~N(0, 1/d) noise. (A
    circular shift is NOT enough: embedding coordinates are
    autocorrelated for clustered data, so shifted copies stayed
    mutually near-duplicate. Sign flips are the decorrelator.)
    Caveat that no construction removes: at d=64 the noise std is
    1/8, so a threshold deep in the tail (e.g. cos 0.4 = 3.2 sigma)
    is crossed by chance ~7e-4 per cross pair — 1.8e8 cross pairs at
    10 copies make ~1e5 chance pairs, dwarfing the 10x-scaled 920
    within-copy pairs. That is intrinsic fixed-dim geometry (tail
    mass grows quadratically with corpus size), NOT a generator
    artifact; measure low-threshold near-dup scaling per-output, or
    raise the threshold (>= 0.7 here) where chance mass is zero.
  - events: event_id/user_id offset, timestamps untouched; written
    with pyarrow parquet 2.6 so ts stays TIMESTAMP(NANOS) like the
    driver's fixture (the engine's nanosAsLong path is exercised).
  - region/nation: dimension tables, copied once (TPC-H convention).
Usage: gen_scale.py SRC_DIR DST_DIR [COPIES=10]
"""
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def stride(table: str, key: str, mult: int = 1) -> int:
        mx = con.sql(
            f"SELECT max({key}) FROM '{src}/{table}.parquet'").fetchone()[0]
        s = int(mx) + 1
        return ((s + mult - 1) // mult) * mult

    def gen(table: str, per_copy) -> None:
        union = " UNION ALL ".join(per_copy(i) for i in range(copies))
        con.sql(f"COPY ({union}) TO '{dst}/{table}.parquet'"
                " (FORMAT PARQUET)")
        print(f"{table}: {copies} copies")

    # dimension tables: copy once
    for t in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet')"
                f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: 1 copy (dimension)")

    s_cust = stride("customer", "c_custkey")
    s_supp = stride("supplier", "s_suppkey")
    s_part = stride("part", "p_partkey")
    s_ord = stride("orders", "o_orderkey")
    s_doc = stride("documents", "doc_id", mult=10)
    s_vec = stride("embeddings", "vec_id")

    gen("customer", lambda i:
        f"SELECT c_custkey + {i * s_cust} AS c_custkey, c_name,"
        f" c_nationkey, c_acctbal, c_mktsegment"
        f" FROM '{src}/customer.parquet'")
    gen("supplier", lambda i:
        f"SELECT s_suppkey + {i * s_supp} AS s_suppkey, s_name,"
        f" s_nationkey, s_acctbal FROM '{src}/supplier.parquet'")
    gen("part", lambda i:
        f"SELECT p_partkey + {i * s_part} AS p_partkey, p_name, p_brand,"
        f" p_type, p_size, p_retailprice FROM '{src}/part.parquet'")
    gen("orders", lambda i:
        f"SELECT o_orderkey + {i * s_ord} AS o_orderkey,"
        f" o_custkey + {i * s_cust} AS o_custkey, o_orderstatus,"
        f" o_totalprice, o_orderdate, o_orderpriority"
        f" FROM '{src}/orders.parquet'")
    gen("lineitem", lambda i:
        f"SELECT l_orderkey + {i * s_ord} AS l_orderkey,"
        f" l_partkey + {i * s_part} AS l_partkey,"
        f" l_suppkey + {i * s_supp} AS l_suppkey, l_linenumber,"
        f" l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,"
        f" l_linestatus, l_shipdate FROM '{src}/lineitem.parquet'")
    gen("documents", lambda i:
        f"SELECT doc_id, text, lang, source, n_chars"
        f" FROM '{src}/documents.parquet'" if i == 0 else
        f"SELECT doc_id + {i * s_doc} AS doc_id,"
        f" text || ' c{i}' AS text, lang, source,"
        f" CAST(length(text || ' c{i}') AS BIGINT) AS n_chars"
        f" FROM '{src}/documents.parquet'")
    # embeddings via numpy: per-copy signed coordinate permutation
    import numpy as np
    et = pq.read_table(f"{src}/embeddings.parquet")
    vec = np.array(et["embedding"].combine_chunks().to_pylist(),
                   dtype=np.float32)
    dim = vec.shape[1]
    eparts = []
    for i in range(copies):
        if i == 0:
            v = vec
        else:
            rs = np.random.RandomState(i)
            perm = rs.permutation(dim)
            signs = rs.randint(0, 2, dim).astype(np.float32) * 2 - 1
            v = vec[:, perm] * signs
        ids = pc.add(et["vec_id"], i * s_vec)
        emb = pa.array(list(v), type=et.schema.field("embedding").type)
        eparts.append(pa.table(
            {"vec_id": ids, "embedding": emb, "label": et["label"]}))
    pq.write_table(pa.concat_tables(eparts), f"{dst}/embeddings.parquet")
    print(f"embeddings: {copies} copies (signed coordinate permutation)")

    # events via pyarrow: keeps ts TIMESTAMP(NANOS) bit-for-bit
    ev = pq.read_table(f"{src}/events.parquet")
    s_ev = pc.max(ev["event_id"]).as_py() + 1
    s_usr = pc.max(ev["user_id"]).as_py() + 1
    parts = []
    for i in range(copies):
        t = ev.set_column(ev.column_names.index("event_id"), "event_id",
                          pc.add(ev["event_id"], i * s_ev))
        t = t.set_column(t.column_names.index("user_id"), "user_id",
                         pc.add(t["user_id"], i * s_usr))
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), f"{dst}/events.parquet",
                   version="2.6", coerce_timestamps=None)
    print(f"events: {copies} copies (nanos preserved)")


if __name__ == "__main__":
    main()
