"""Multi-point scale-curve probe for corpus ops (documents + embeddings).

The sf0.1->sf1 ratio pin alone cannot distinguish "constant-dominated"
from "super-linear" for sub-second ops: a 10x ratio of 8.8 is consistent
with both t = c + a*n (c large) and t = c + b*n^2.  A THIRD (and fourth)
point settles it — replicate documents to k copies of sf0.1 with the same
token-suffix scheme tools/make_sf1.py uses (each copy's internal near-dup
structure preserved, cross-copy shingles distinct -> linear candidate
growth, like a real kx corpus), then compare INCREMENTAL slopes:

    slope(k1->k2) = (t(k2) - t(k1)) / (k2 - k1)

Linear ops show a ~flat incremental slope; quadratic ops show slope
growing ~proportionally to k.  Results print per-op; SCALE.md records the
adjudication.

    python tools/probe_scale_curve.py op_sample_stratified op_dedup_simhash
    python tools/probe_scale_curve.py --copies 10,20,50 op_sample_stratified
    python tools/probe_scale_curve.py --table lineitem op_orders_market_basket

``--table lineitem`` replicates lineitem instead (l_orderkey shifted per
copy, every other table copied once from sf0.1), for per-ORDER-blocked
ops — the r16 market-basket curve.  CAVEAT: FK-joining ops (the op_sql_q*
family) see a k-fold fan-out per order/customer under this replication,
which is a skew stress, not a corpus-growth model — adjudicate those
curves accordingly or prefer the sf0.1->sf1 pin (tools/scaling_pass.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SRC = "/root/testdata/sf0.1"


def ceil_base(n: int) -> int:
    b = 1
    while b <= n:
        b *= 10
    return b


def make_corpus(copies: int) -> str:
    """documents.parquet + embeddings.parquet at ``copies`` x sf0.1, cached
    under .tmp — the tools/make_sf1.py replication schemes (doc_id shift +
    per-copy token suffix; vec_id shift + per-copy cyclic dimension
    rotation, here ``(7k) mod 64`` so all 50 copies get DISTINCT rotations
    — make_sf1's ``6k`` slice is only valid for k <= 10)."""
    import duckdb

    dst = os.path.join(ROOT, ".tmp", f"docs_x{copies}")
    marker = os.path.join(dst, "_DONE_v2")
    if os.path.exists(marker):
        return dst
    import shutil

    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    con = duckdb.connect()
    b_doc = ceil_base(
        con.sql(f"SELECT max(doc_id) FROM '{SRC}/documents.parquet'").fetchone()[0]
    )
    cols = [
        c[0]
        for c in con.sql(
            f"describe select * from '{SRC}/documents.parquet'"
        ).fetchall()
    ]
    rest = ", ".join(c for c in cols if c not in ("doc_id", "text"))
    con.sql(
        f"""COPY (SELECT doc_id + k * {b_doc} AS doc_id,
                        array_to_string(
                          list_transform(string_split(text, ' '),
                                         x -> x || 'x' || CAST(k AS VARCHAR)),
                          ' ') AS text,
                        {rest}
                 FROM '{SRC}/documents.parquet',
                      generate_series(0, {copies - 1}) g(k))
            TO '{dst}/documents.parquet'"""
    )
    b_vec = ceil_base(
        con.sql(f"SELECT max(vec_id) FROM '{SRC}/embeddings.parquet'").fetchone()[0]
    )
    con.sql(
        f"""COPY (SELECT vec_id + k * {b_vec} AS vec_id,
                        CAST(list_concat(embedding[(7 * k) % 64 + 1:],
                                         embedding[1:(7 * k) % 64]) AS FLOAT[])
                          AS embedding,
                        label
                 FROM '{SRC}/embeddings.parquet',
                      generate_series(0, {copies - 1}) g(k))
            TO '{dst}/embeddings.parquet'"""
    )
    open(marker, "w").close()
    return dst


def make_lineitem_corpus(copies: int) -> str:
    """lineitem at ``copies`` x sf0.1 (l_orderkey + k*base — per-copy
    baskets preserved, order-key cardinality grows k-fold), all other
    tables copied once.  Basket-blocked pair work grows linearly; see the
    module docstring's FK-fan-out caveat for join-family ops."""
    import shutil

    import duckdb

    dst = os.path.join(ROOT, ".tmp", f"li_x{copies}")
    marker = os.path.join(dst, "_DONE_v1")
    if os.path.exists(marker):
        return dst
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    con = duckdb.connect()
    src = f"{SRC}/lineitem.parquet"
    b = ceil_base(con.sql(f"SELECT max(l_orderkey) FROM '{src}'").fetchone()[0])
    cols = [c[0] for c in con.sql(f"describe select * from '{src}'").fetchall()]
    rest = ", ".join(c for c in cols if c != "l_orderkey")
    con.sql(
        f"""COPY (SELECT l_orderkey + k * {b} AS l_orderkey, {rest}
                 FROM '{src}', generate_series(0, {copies - 1}) g(k))
            TO '{dst}/lineitem.parquet'"""
    )
    for name in os.listdir(SRC):
        if name.endswith(".parquet") and name != "lineitem.parquet":
            shutil.copy(os.path.join(SRC, name), os.path.join(dst, name))
    open(marker, "w").close()
    return dst


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ops", nargs="+")
    ap.add_argument("--copies", default="10,20,50")
    ap.add_argument("--table", choices=["documents", "lineitem"], default="documents")
    args = ap.parse_args()
    copy_points = [int(c) for c in args.copies.split(",")]

    from daq_3i_spark.cache import release_shared
    from daq_3i_spark.plans import QUERIES
    from daq_3i_spark.session import get_spark

    spark = get_spark("probe_scale_curve", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, sf_dir: str) -> float:
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        QUERIES[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        release_shared()
        return dt

    build = make_corpus if args.table == "documents" else make_lineitem_corpus
    prefix = "docs" if args.table == "documents" else "li"
    dirs = {1: SRC}
    for k in copy_points:
        dirs[k] = build(k)
        print(f"built {prefix}_x{k}", flush=True)

    out: dict[str, dict] = {}
    for name in args.ops:
        times: dict[int, float] = {}
        for k in sorted(dirs):
            run(name, dirs[k])  # warm
            times[k] = round(min(run(name, dirs[k]) for _ in range(2)), 3)
        ks = sorted(times)
        slopes = {
            f"{a}->{b}": round((times[b] - times[a]) / (b - a), 4)
            for a, b in zip(ks, ks[1:])
        }
        out[name] = {"sec_at_copies": times, "incremental_slope_sec_per_copy": slopes}
        print(f"{name}: {json.dumps(out[name])}", flush=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
