"""Cross-engine portability tests for the round-5 additions: the
multi-pattern PII scrub chain (op_text_scrub) and the portable KMV
distinct-count sketch (op_sql_kmv_sketch).  Both ops' oracle contract is
bit-identical Spark/DuckDB output; these tests drive the kernels directly
on adversarial fixtures the synthetic corpus doesn't contain."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from daq_3i_spark.plans.extension_ops import (
    _PII_EMAIL,
    _PII_LONGID,
    _PII_PHONE,
    _PII_SSN,
)
from daq_3i_spark.plans.sql_surface2 import _KMV_K, _hex48
from daq_3i_spark.plans import QUERIES

PII_CASES = [
    "reach me at john.doe+spam@sub.example.co.uk or 555-123-4567",
    "+4915123456789 is my number; backup 030.1234.5678",
    "ssn 123-45-6789 acct 123456789012",
    "a@b.co x@y.z",  # second address has a 1-letter TLD: must NOT match
    "12345",  # below the long-run floor: residual digits only
    "123456",  # exactly at the long-run floor
    "id9999999@x.comm555-12-3456",
    "no pii at all, not even digits",
    "",
    "+12 and + 1234567 and ++123456789",
]

_CHAIN = [
    (_PII_EMAIL, "<EMAIL>"),
    (_PII_SSN, "<ID>"),
    (_PII_PHONE, "<PHONE>"),
    (_PII_LONGID, "<ID>"),
    ("[0-9]", "#"),
]


def _spark_scrub(spark, texts):
    expr = "text"
    for pat, repl in _CHAIN:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}')"
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r[0] for r in df.select(F.expr(expr).alias("v")).collect()]


def _duck_scrub(texts):
    expr = "text"
    for pat, repl in _CHAIN:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    con = duckdb.connect()
    return [
        con.execute(f"SELECT {expr} FROM (SELECT ? AS text)", [t]).fetchone()[0]
        for t in texts
    ]


def test_pii_chain_cross_engine(spark):
    assert _spark_scrub(spark, PII_CASES) == _duck_scrub(PII_CASES)


def test_pii_chain_semantics(spark):
    out = dict(zip(PII_CASES, _spark_scrub(spark, PII_CASES)))
    assert out[PII_CASES[0]] == "reach me at <EMAIL> or <PHONE>"
    assert out["ssn 123-45-6789 acct 123456789012"] == "ssn <ID> acct <ID>"
    assert out["a@b.co x@y.z"] == "<EMAIL> x@y.z"
    assert out["12345"] == "#####"
    assert out["123456"] == "<ID>"
    assert out["no pii at all, not even digits"] == "no pii at all, not even digits"


def test_pii_registry_counts(spark, sf_dir):
    """Every synthetic doc carries exactly one trailer of each PII kind."""
    df = QUERIES["op_text_scrub"].spark(spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["n_emails"] == 1
        assert r["n_ssn"] == 1
        assert r["n_phones"] == 1
        assert r["n_ids"] == 1  # the 9-digit ref trailer
        assert r["n_digits"] == 0  # nothing left un-redacted


def test_hex48_cross_engine(spark):
    """The 48-bit md5-positional hash is bit-identical across engines."""
    s = _hex48("md5(encode(CAST(id AS STRING), 'utf-8'))", "instr")
    sv = [
        r[0]
        for r in spark.range(500).select(F.expr(s).alias("u")).collect()
    ]
    d = _hex48("md5(CAST(id AS VARCHAR))", "strpos")
    con = duckdb.connect()
    dv = [
        r[0]
        for r in con.execute(
            f"SELECT {d} AS u FROM (SELECT range AS id FROM range(500)) ORDER BY id"
        ).fetchall()
    ]
    assert sv == dv
    assert all(0 <= v < 2**48 for v in sv)


def test_kmv_estimate_branches(spark, sf_dir):
    """Exact branch when nd <= k; estimate branch within KMV's error
    envelope when nd >> k (rel std err ~ 1/sqrt(k-2); allow 4 sigma)."""
    rows = {
        r["l_returnflag"]: r
        for r in QUERIES["op_sql_kmv_sketch"].spark(spark, sf_dir).collect()
    }
    assert rows
    for r in rows.values():
        nd, est = r["n_distinct_exact"], r["kmv_estimate"]
        if nd <= _KMV_K:
            assert est == float(nd)
        else:
            assert abs(est - nd) / nd < 4 / (_KMV_K - 2) ** 0.5


# --- hot-bucket cap (op_dedup_minhash_capped) --------------------------------


def _viral_docs():
    viral = "spark table scan merge window batch value key row agg"
    noise = [
        f"doc {i} unique filler words alpha beta gamma delta {i} epsilon"
        for i in range(20)
    ]
    rows = [(i, viral) for i in range(200)]
    rows += [(1000 + i, t) for i, t in enumerate(noise)]
    return rows


def test_capped_viral_bucket_linear_work(spark):
    """200 exact copies must produce exactly the 199 star pairs (0, j) —
    not the 19 900-pair clique the uncapped self-join would expand."""
    from daq_3i_spark.plans.extension_ops import minhash_capped_pairs

    docs = spark.createDataFrame(_viral_docs(), "doc_id long, text string")
    pairs = minhash_capped_pairs(docs).collect()
    copy_pairs = {(r["doc_a"], r["doc_b"]) for r in pairs if r["doc_b"] < 1000}
    assert copy_pairs == {(0, j) for j in range(1, 200)}
    for r in pairs:
        if r["doc_b"] < 1000:
            assert r["est_sim"] == 1.0


def test_capped_cross_engine_viral(spark):
    """The capped op's DuckDB oracle agrees with Spark on the viral corpus."""
    import pandas as pd

    from daq_3i_spark.plans.extension_ops import minhash_capped_pairs

    rows = _viral_docs()
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_a"], r["doc_b"], r["est_sim"])
        for r in minhash_capped_pairs(docs).collect()
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(
        (a, b, s)
        for a, b, s in con.execute(
            QUERIES["op_dedup_minhash_capped"].oracle
        ).fetchall()
    )
    assert got == want


def test_capped_equals_uncapped_without_hot_buckets(spark, sf_dir):
    """On the synthetic corpus (max bucket size 14 < cap never trips at
    sf0.001) the capped op must be pair-for-pair identical to the plain one."""
    plain = {
        (r["doc_a"], r["doc_b"], r["est_sim"])
        for r in QUERIES["op_dedup_minhash"].spark(spark, sf_dir).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"], r["est_sim"])
        for r in QUERIES["op_dedup_minhash_capped"].spark(spark, sf_dir).collect()
    }
    assert plain == capped


def test_ngram_capped_equals_uncapped_without_hot_shingles(spark, sf_dir):
    """On the synthetic corpus (max shingle df 14 at sf0.1, less at sf0.001)
    the df cap never trips, so the capped op must be pair-for-pair identical
    to the exact op."""
    plain = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in QUERIES["op_dedup_ngram_jaccard"].spark(spark, sf_dir).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in QUERIES["op_dedup_ngram_capped"].spark(spark, sf_dir).collect()
    }
    assert plain == capped


def test_ngram_capped_viral_shingles_dropped(spark):
    """200 copies of one doc push every one of its shingles past the df cap:
    the viral docs drop out of the posting lists entirely (bounding pair work
    at cap x |postings| — the capped-LSH path owns viral detection), and the
    DuckDB oracle agrees with Spark on the same corpus."""
    import pandas as pd

    from daq_3i_spark.plans.extension_ops import ngram_capped_pairs

    rows = [(i, t, "en") for i, t in _viral_docs()]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    pairs = ngram_capped_pairs(docs).collect()
    assert not [r for r in pairs if r["doc_a"] < 1000 and r["doc_b"] < 1000]

    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )
    want = sorted(
        (a, b, j)
        for a, b, j in con.execute(
            QUERIES["op_dedup_ngram_capped"].oracle
        ).fetchall()
    )
    got = sorted((r["doc_a"], r["doc_b"], r["jaccard"]) for r in pairs)
    assert got == want


def test_pii_chain_fuzz_cross_engine(spark):
    """Seeded random ASCII fuzz: the scrub chain must stay bit-identical
    across engines on arbitrary digit/symbol soup, not just curated cases."""
    import random

    rng = random.Random(0x5EED)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyz0123456789 @.+-()#\t\n"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ_%,;:!\x0b"
    )
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120)))
        for _ in range(150)
    ]
    assert _spark_scrub(spark, cases) == _duck_scrub(cases)


def test_bench_guard_self():
    """The guard must flag an unexplained 2x slide and accept explained ones."""
    import json
    import subprocess
    import sys
    import tempfile
    import os

    with tempfile.TemporaryDirectory() as d:
        prev = os.path.join(d, "prev.json")
        new = os.path.join(d, "new.json")
        notes = os.path.join(d, "notes.md")
        json.dump({"queries": {"q_ok": 1.0, "q_bad": 1.0}}, open(prev, "w"))
        json.dump({"queries": {"q_ok": 1.1, "q_bad": 2.0}}, open(new, "w"))
        open(notes, "w").write("nothing relevant\n")
        guard = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "bench_guard.py",
        )
        r = subprocess.run(
            [sys.executable, guard, prev, new, "--notes", notes],
            capture_output=True,
            text=True,
        )
        assert r.returncode == 1 and "q_bad" in r.stdout
        open(notes, "w").write("q_bad: accepted, data got heavier\n")
        r = subprocess.run(
            [sys.executable, guard, prev, new, "--notes", notes],
            capture_output=True,
            text=True,
        )
        assert r.returncode == 0, r.stdout + r.stderr


def test_histogram_quantile_error_bound(spark, sf_dir):
    """The fixed-grid p50 estimate must sit within one bucket width of the
    exact median (linear interpolation cannot leave the straddling bucket)."""
    from daq_3i_spark.plans.sql_surface2 import _HIST_WIDTH

    est = {
        r["l_returnflag"]: r["p50_est"]
        for r in QUERIES["op_sql_histogram_quantile"].spark(spark, sf_dir).collect()
    }
    assert est
    con = duckdb.connect()
    exact = {
        f: p
        for f, p in con.execute(
            f"SELECT l_returnflag, quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) "
            f"FROM '{sf_dir}/lineitem.parquet' GROUP BY 1"
        ).fetchall()
    }
    for flag, e in est.items():
        assert abs(e - exact[flag]) <= _HIST_WIDTH, (flag, e, exact[flag])


def test_capped_pairs_feed_components(spark):
    """End-to-end viral-scale dedup: capped star pairs -> star-contraction
    components must still recover the full 200-copy cluster."""
    from daq_3i_spark.operators.graph import star_components
    from daq_3i_spark.plans.extension_ops import minhash_capped_pairs

    docs = spark.createDataFrame(_viral_docs(), "doc_id long, text string")
    pairs = minhash_capped_pairs(docs).select("doc_a", "doc_b")
    labels = {
        r["doc_id"]: r["component"]
        for r in star_components(spark, pairs).collect()
    }
    viral_labels = {labels[i] for i in range(200) if i in labels}
    assert viral_labels == {0}, "all 200 copies must share the min-label root"


# --- TPC-H analog brute-force crosschecks ------------------------------------


def test_q21_analog_matches_bruteforce(spark, sf_dir):
    """The semi/anti self-join realization must equal a literal python
    evaluation of the EXISTS / NOT EXISTS definition on the same data."""
    from collections import defaultdict

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    orders = {
        r["o_orderkey"]: r
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
        if r["o_orderstatus"] == "F"
    }
    import datetime

    suppliers_of = defaultdict(set)
    for r in li:
        suppliers_of[r["l_orderkey"]].add(r["l_suppkey"])
    late = []
    for r in li:
        o = orders.get(r["l_orderkey"])
        if o and r["l_shipdate"] > o["o_orderdate"] + datetime.timedelta(days=90):
            late.append((r["l_orderkey"], r["l_suppkey"]))
    late_supps = defaultdict(set)
    for ok, sk in late:
        late_supps[ok].add(sk)
    numwait = defaultdict(int)
    for ok, sk in late:
        if len(suppliers_of[ok]) > 1 and late_supps[ok] == {sk}:
            numwait[sk] += 1
    want = sorted(numwait.items(), key=lambda t: (-t[1], t[0]))[:10]
    got = [
        (r["s_suppkey"], r["numwait"])
        for r in QUERIES["op_sql_q21_waiting"].spark(spark, sf_dir).collect()
    ]
    assert got == want


def test_q2_analog_matches_bruteforce(spark, sf_dir):
    """Window-min + double-equality join must equal a literal python
    evaluation: per LARGE part, the supplier(s) achieving the min unit
    price, ordered by acctbal desc with the full tie-break chain."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    parts = {
        r["p_partkey"]
        for r in spark.read.parquet(f"{sf_dir}/part.parquet").collect()
        if r["p_type"] == "LARGE"
    }
    supp = {r["s_suppkey"]: r for r in spark.read.parquet(f"{sf_dir}/supplier.parquet").collect()}
    nation = {r["n_nationkey"]: r["n_name"] for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()}
    cost = {}
    for r in li:
        if r["l_partkey"] in parts:
            k = (r["l_partkey"], r["l_suppkey"])
            u = r["l_extendedprice"] / r["l_quantity"]
            cost[k] = min(cost.get(k, float("inf")), u)
    pmin = {}
    for (pk, sk), u in cost.items():
        pmin[pk] = min(pmin.get(pk, float("inf")), u)
    rows = []
    for (pk, sk), u in cost.items():
        if u == pmin[pk]:
            s = supp[sk]
            rows.append(
                (s["s_acctbal"], s["s_name"], nation[s["s_nationkey"]], pk, u, sk)
            )
    rows.sort(key=lambda t: (-t[0], t[2], t[1], t[3], t[5]))
    want = [t[:5] for t in rows[:100]]
    got = [
        (r["s_acctbal"], r["s_name"], r["n_name"], r["p_partkey"], r["unit_cost"])
        for r in QUERIES["op_sql_q2_mincost"].spark(spark, sf_dir).collect()
    ]
    assert got == want


def test_q20_analog_matches_bruteforce(spark, sf_dir):
    """Dominant-supplier semantics: 2*q > total per part, PROMO parts,
    1997 shipments, nation prefix filter."""
    import datetime
    from collections import defaultdict

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    promo = {
        r["p_partkey"]
        for r in spark.read.parquet(f"{sf_dir}/part.parquet").collect()
        if r["p_type"] == "PROMO"
    }
    nat = {
        r["n_nationkey"]
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
        if r["n_name"].startswith("NATION_1")
    }
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").collect()
    lo = datetime.datetime(1997, 1, 1)
    hi = datetime.datetime(1998, 1, 1)
    q = defaultdict(int)
    for r in li:
        if r["l_partkey"] in promo and lo <= r["l_shipdate"] < hi:
            q[(r["l_suppkey"], r["l_partkey"])] += int(r["l_quantity"] * 1e6 + 0.5)
    tot = defaultdict(int)
    for (sk, pk), v in q.items():
        tot[pk] += v
    dominant = {sk for (sk, pk), v in q.items() if 2 * v > tot[pk]}
    want = sorted(
        (s["s_suppkey"], s["s_name"])
        for s in supp
        if s["s_suppkey"] in dominant and s["s_nationkey"] in nat
    )
    got = sorted(
        (r["s_suppkey"], r["s_name"])
        for r in QUERIES["op_sql_q20_dominant"].spark(spark, sf_dir).collect()
    )
    assert got == want


def test_cm_sketch_never_underestimates(spark, sf_dir):
    """The count-min guarantee: estimate >= exact for every reported token,
    and the exact counts match a direct recount of the corpus."""
    from collections import Counter

    rows = QUERIES["op_sql_cm_sketch"].spark(spark, sf_dir).collect()
    assert len(rows) == 20
    exact = Counter()
    for (text,) in spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "text"
    ).collect():
        exact.update(text.lower().split(" "))
    for r in rows:
        assert r["over_count"] >= 0
        assert r["cm_estimate"] == r["n_exact"] + r["over_count"]
        assert r["n_exact"] == exact[r["token"]]


def test_bench_guard_median_fallback_needs_sample_size():
    """Probe-less comparisons: a LARGE common set with a uniform host shift
    plus one real slide gets median-normalized (host shift cancelled, the
    real slide still flagged); a TINY common set uses raw ratios — a median
    over 2 queries would let the one real regression normalize itself away
    (the r11 self-test regression).  This test exercises the 12-query
    median path; the tiny-set raw-ratio branch (len(common) < MIN_MEDIAN_N)
    is pinned by test_bench_guard_self's 2-query case."""
    import json
    import os
    import subprocess
    import sys
    import tempfile

    guard = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "bench_guard.py",
    )
    with tempfile.TemporaryDirectory() as d:
        prev = os.path.join(d, "prev.json")
        new = os.path.join(d, "new.json")
        notes = os.path.join(d, "notes.md")
        open(notes, "w").write("nothing relevant\n")
        # 11 steady queries under a uniform 1.3x host window + 1 real 3x slide
        pq = {f"q{i}": 1.0 for i in range(11)} | {"q_slide": 1.0}
        nq = {f"q{i}": 1.3 for i in range(11)} | {"q_slide": 3.0}
        json.dump({"queries": pq}, open(prev, "w"))
        json.dump({"queries": nq}, open(new, "w"))
        r = subprocess.run(
            [sys.executable, guard, prev, new, "--notes", notes],
            capture_output=True, text=True,
        )
        # median 1.3 cancels the window; 3.0/1.3 = 2.3x flags the real slide
        assert r.returncode == 1 and "q_slide" in r.stdout, r.stdout + r.stderr
        assert "median per-query ratio 1.30x" in r.stdout
        # steady queries must NOT be flagged
        assert "REGRESSION q0" not in r.stdout


def test_simhash_viral_corpus_cross_engine(spark, tmp_path):
    """The skew edge for the banded simhash join: 200 exact copies collide
    in every band (one hot bucket per band), and the clique IS the correct
    output — all 19,900 pairs at hamming 0, deduplicated across the 4 band
    matches, bit-identical across engines.  (The hot-bucket WORK concern is
    AQE skew-join territory; the capped-star alternative lives in the
    minhash family.  This pins that correctness survives the skew shape.)"""
    import pandas as pd

    rows = _viral_docs() + [
        (1000 + i, f"distinct document number {i} about topic {i * 7}")
        for i in range(50)
    ]
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1) \
        .write.parquet(str(sf / "documents.parquet"))

    got = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in QUERIES["op_dedup_simhash"].spark(spark, str(sf)).collect()
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(tuple(r) for r in con.execute(
        QUERIES["op_dedup_simhash"].oracle
    ).fetchall())
    assert got == want
    viral = [(a, b, h) for a, b, h in got if a < 1000 and b < 1000]
    assert len(viral) == 200 * 199 // 2  # the full clique, deduped across bands
    assert all(h == 0 for _, _, h in viral)
