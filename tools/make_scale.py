"""Synthesize a K×-scaled copy of an sf fixture dir for scale validation.

Each table is K id-offset copies of the source unioned together, preserving
FK structure inside every copy (all 64-bit keys shift by copy*stride).
Content perturbation keeps the dedup/similarity workloads honest at K×:

- documents: each copy appends FOUR copy-specific tokens to the text, so
  a doc's cross-copy twin sits at Jaccard ≈ n/(n+8) ≈ 0.74 for the
  median 23-token doc — below the LSH 4×12 banding's collision knee
  (P ≈ 0.10 at J=0.74 vs 0.72 at J=0.90, which a single-token
  perturbation would have produced) — so candidate-pair volume scales
  ~K, like a real corpus, not like K mutually-near-duplicate corpora.
- embeddings: dimension 0 shifts by copy*0.01 — cross-copy cosine stays
  ~1-1e-4, below no threshold, but vec_ids differ so top-k/IVF see K× the
  candidates, which is the scaling being measured.
- events: ts shifts by copy minutes so window/session state doesn't
  collapse onto identical timelines.

Usage: python tools/make_scale.py [K] [src_sf_dir] [dest_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

STRIDE = 10_000_000


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dest = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", f"x{k}"
    )
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT unnest(range({k})) AS c")

    def emit(table: str, select: str) -> None:
        out = os.path.join(dest, f"{table}.parquet")
        con.execute(
            f"COPY (SELECT {select} FROM '{src}/{table}.parquet' CROSS JOIN copies) "
            f"TO '{out}' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows")

    # region/nation are genuinely fixed-cardinality dims — 1 copy, no offset.
    for t, sel in (("region", "r_regionkey, r_name"),
                   ("nation", "n_nationkey, n_name, n_regionkey")):
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet') "
            f"TO '{os.path.join(dest, t + '.parquet')}' (FORMAT PARQUET)"
        )
        print(f"{t}: 1x (fixed-cardinality dim)")

    emit(
        "customer",
        f"c_custkey + c * {STRIDE} AS c_custkey, c_name, c_nationkey, "
        "c_acctbal, c_mktsegment",
    )
    emit(
        "supplier",
        f"s_suppkey + c * {STRIDE} AS s_suppkey, s_name, s_nationkey, s_acctbal",
    )
    emit(
        "part",
        f"p_partkey + c * {STRIDE} AS p_partkey, p_name, p_brand, p_type, "
        "p_size, p_retailprice",
    )
    emit(
        "orders",
        f"o_orderkey + c * {STRIDE} AS o_orderkey, "
        f"o_custkey + c * {STRIDE} AS o_custkey, o_orderstatus, o_totalprice, "
        "o_orderdate, o_orderpriority",
    )
    emit(
        "lineitem",
        f"l_orderkey + c * {STRIDE} AS l_orderkey, "
        f"l_partkey + c * {STRIDE} AS l_partkey, "
        f"l_suppkey + c * {STRIDE} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate",
    )
    emit(
        "events",
        f"event_id + c * {STRIDE} AS event_id, "
        "ts + to_minutes(CAST(c AS BIGINT)) AS ts, "
        f"user_id + c * {STRIDE} AS user_id, event_type, value, props",
    )
    emit(
        "documents",
        f"doc_id + c * {STRIDE} AS doc_id, "
        "text || ' ct' || CAST(c AS VARCHAR) || ' cu' || CAST(c AS VARCHAR)"
        " || ' cv' || CAST(c AS VARCHAR) || ' cw' || CAST(c AS VARCHAR)"
        " AS text, lang, source, "
        "n_chars + 12 + 4 * CAST(length(CAST(c AS VARCHAR)) AS BIGINT)"
        " AS n_chars",
    )
    emit(
        "embeddings",
        f"vec_id + c * {STRIDE} AS vec_id, "
        "list_prepend(embedding[1] + CAST(c AS FLOAT) * 0.01, "
        "embedding[2:]) AS embedding, label",
    )
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
