"""Synthesize an sf1-scale dataset for the scaling pass (BENCH_NOTES.md).

The driver ships sf0.001/0.01/0.1 only.  For the 10x scaling measurement we
replicate the sf0.1 TPC-H tables + events 10x with KEY-SHIFTED copies (copy
k shifts every entity key by k * ceil_base(table)), which preserves the join
structure exactly: per-customer order counts, per-order line counts,
per-channel sample densities and key-group sizes all stay constant while
row counts grow 10x — the clean way to see whether a plan scales linearly.

documents are replicated 10x with doc_id shifts AND a per-copy token
suffix, which preserves each copy's internal near-dup structure while
making every cross-copy shingle distinct — candidate-pair work scales
linearly, like a real 10x corpus with the same dup rate.  embeddings are
replicated 10x with vec_id shifts AND a per-copy cyclic DIMENSION ROTATION
(copy k rotates every vector by 6k positions): rotation is an orthogonal
transform, so each copy's internal cosine/dot structure — norms, neighbor
lists, cluster geometry — is preserved exactly, while cross-copy vectors
decorrelate and land in genuinely different LSH/IVF/PQ cells.  A naive
unrotated copy would stack 10 identical populations into the same cells
(quadratic pair inflation that measures the replication artifact, not the
plan); rotation gives the linear candidate growth of a real 10x corpus.

    python tools/make_sf1.py            # writes /root/repo/.tmp/sf1/
"""

from __future__ import annotations

import os
import shutil

import duckdb

SRC = "/root/testdata/sf0.1"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(ROOT, ".tmp", "sf1")
COPIES = 10


def ceil_base(n: int) -> int:
    """The smallest power of 10 above n — keys shift by a round base so
    shifted ids stay human-readable and collision-free."""
    b = 1
    while b <= n:
        b *= 10
    return b


def main() -> None:
    if os.path.isdir(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    con = duckdb.connect()

    def mx(table: str, col: str) -> int:
        return con.sql(f"SELECT max({col}) FROM '{SRC}/{table}.parquet'").fetchone()[0]

    b_cust = ceil_base(mx("customer", "c_custkey"))
    b_supp = ceil_base(mx("supplier", "s_suppkey"))
    b_part = ceil_base(mx("part", "p_partkey"))
    b_ord = ceil_base(mx("orders", "o_orderkey"))
    b_evt = ceil_base(mx("events", "event_id"))
    b_usr = ceil_base(mx("events", "user_id"))

    # dims referenced by unshifted foreign keys: copy once
    for t in ("region", "nation"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")

    # embeddings: 10x with vec_id shift + per-copy cyclic dimension rotation
    # (see module docstring — orthogonal per copy, decorrelated across)
    b_vec = ceil_base(mx("embeddings", "vec_id"))
    con.sql(
        f"""COPY (SELECT vec_id + k * {b_vec} AS vec_id,
                        CAST(list_concat(embedding[6 * k + 1:],
                                         embedding[1:6 * k]) AS FLOAT[])
                          AS embedding,
                        label
                 FROM '{SRC}/embeddings.parquet',
                      generate_series(0, {COPIES - 1}) g(k))
            TO '{DST}/embeddings.parquet'"""
    )

    # documents: 10x with doc_id shift AND every token suffixed by the copy
    # index.  The suffix keeps each copy's INTERNAL near-dup structure intact
    # (shingles/minhash/ngram relations are preserved within a copy) while
    # making every cross-copy shingle distinct — so candidate-pair work
    # should scale LINEARLY in copies, which is exactly what a real 10x
    # corpus (more docs, same dup rate) does.  A naive text copy would
    # instead make every document a 10-way exact duplicate (quadratic pair
    # blowup that measures the replication artifact, not the plan).
    b_doc = ceil_base(mx("documents", "doc_id"))
    doc_cols = [
        c[0] for c in con.sql(f"describe select * from '{SRC}/documents.parquet'").fetchall()
    ]
    rest = ", ".join(c for c in doc_cols if c not in ("doc_id", "text"))
    con.sql(
        f"""COPY (SELECT doc_id + k * {b_doc} AS doc_id,
                        array_to_string(
                          list_transform(string_split(text, ' '),
                                         x -> x || 'x' || CAST(k AS VARCHAR)),
                          ' ') AS text,
                        {rest}
                 FROM '{SRC}/documents.parquet',
                      generate_series(0, {COPIES - 1}) g(k))
            TO '{DST}/documents.parquet'"""
    )

    shifted = {
        "customer": ("c_custkey + k * {b}".format(b=b_cust), "c_custkey"),
        "supplier": ("s_suppkey + k * {b}".format(b=b_supp), "s_suppkey"),
        "part": ("p_partkey + k * {b}".format(b=b_part), "p_partkey"),
    }
    for t, (expr, col) in shifted.items():
        cols = [c[0] for c in con.sql(f"describe select * from '{SRC}/{t}.parquet'").fetchall()]
        rest = ", ".join(c for c in cols if c != col)
        con.sql(
            f"COPY (SELECT {expr} AS {col}, {rest} FROM '{SRC}/{t}.parquet', "
            f"generate_series(0, {COPIES - 1}) g(k)) TO '{DST}/{t}.parquet'"
        )

    con.sql(
        f"""COPY (SELECT o_orderkey + k * {b_ord} AS o_orderkey,
                        o_custkey + k * {b_cust} AS o_custkey,
                        o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
                 FROM '{SRC}/orders.parquet', generate_series(0, {COPIES - 1}) g(k))
            TO '{DST}/orders.parquet'"""
    )
    con.sql(
        f"""COPY (SELECT l_orderkey + k * {b_ord} AS l_orderkey,
                        l_partkey + k * {b_part} AS l_partkey,
                        l_suppkey + k * {b_supp} AS l_suppkey,
                        l_linenumber, l_quantity, l_extendedprice, l_discount,
                        l_tax, l_returnflag, l_linestatus, l_shipdate
                 FROM '{SRC}/lineitem.parquet', generate_series(0, {COPIES - 1}) g(k))
            TO '{DST}/lineitem.parquet'"""
    )
    con.sql(
        f"""COPY (SELECT event_id + k * {b_evt} AS event_id, ts,
                        user_id + k * {b_usr} AS user_id, event_type, value, props
                 FROM '{SRC}/events.parquet', generate_series(0, {COPIES - 1}) g(k))
            TO '{DST}/events.parquet'"""
    )

    for t in ("customer", "supplier", "part", "orders", "lineitem", "events", "documents"):
        n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    main()
