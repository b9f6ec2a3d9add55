"""SURVEY.md §2.8 extension operators — the LLM-data-pipeline surface.

The reference daemon has none of these (it is a scalar DAQ pipeline); they are
the BASELINE.json north-star additions: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding-cosine), similarity search (brute-force
top-k + LSH-bucketed), text analysis (stats, token counting, language-ID,
quality scoring, winnowing fingerprints), multimodal column plumbing, and
event-time windowing — each designed for 100 TB scale and each with a DuckDB
oracle where SQL can express it.

Oracle-parity strategy: every hash-dependent kernel is *portable arithmetic*
(functions/text.py) rendered for both engines from the same template, so the
oracle reproduces Spark's values bit-for-bit — including the doubles, which
are built only from correctly-rounded ops (+ - * / sqrt) applied in the same
order.

Scale notes (the local[32] test is correctness; the design target is a
1000-executor cluster):

* all per-doc kernels (hashing, signatures, stats) are narrow projections —
  pure codegen, no shuffle, linear scan; they scale with input splits;
* candidate generation (LSH bands / shingle join / block keys) shuffles on
  the *bucket* key, never all-pairs: minhash bands bound pair work to bucket
  cardinality, the shingle join blocks on (lang, shingle), embeddings block
  on label, LSH-ANN blocks on a 4-bit sign bucket.  Skewed buckets are the
  known risk — AQE skew-join splitting is on (session.py) and bucket width
  is a tunable;
* brute-force top-k keeps the small query side broadcast so the corpus scan
  is shuffle-free until the final per-query top-k (k rows per partition, then
  k global).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daq_3i_spark.functions.text import DUCK, MINHASH_K, SPARK, P
from daq_3i_spark.functions.vectors import (
    cos_block_pairs,
    cos_scores_queries,
    cosine_from_norms,
    dot_unrolled,
    duckdb_dot_fold,
    duckdb_norm2_fold,
    sign_buckets_np,
)
from daq_3i_spark.cache import shared
from daq_3i_spark.functions.numeric import fx_sum
from daq_3i_spark.plans.registry import register
from daq_3i_spark.sources.tables import load_events, load_spread, load_table


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


@register(
    "op_dedup_exact",
    """WITH n AS (
      SELECT doc_id, regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g') AS norm
      FROM documents
    ), k AS (SELECT min(doc_id) AS doc_id FROM n GROUP BY norm)
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d JOIN k USING (doc_id)""",
    doc="exact dedup on whitespace-normalized lowercased text, keep min doc_id "
    "(hash-groupBy; at scale: one shuffle on the normalized-text hash)",
)
def op_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # group-by-min + semi-join beats a window over the full-text key: the
    # aggregate combines map-side and shuffles only (norm-hash, min-id) pairs,
    # and the semi-join shuffles compact longs — never full texts.
    docs = load_spread(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower("text"), r"[ \t\n\x0b\f\r]+", " ")
    keep = (
        docs.select(F.col("doc_id"), norm.alias("__norm"))
        .groupBy("__norm")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return docs.join(keep, "doc_id", "semi").select(
        "doc_id", "lang", "source", "n_chars"
    )


def _duck_sig_cte() -> str:
    """DuckDB CTE chain documents -> token hashes -> shingles -> minhash sig."""
    return f"""th AS (
      SELECT doc_id, {DUCK.token_hashes('text')} AS th FROM documents
      WHERE len(string_split(lower(text), ' ')) >= 3
    ), sh AS (SELECT doc_id, {DUCK.shingle_hashes('th')} AS sh FROM th),
    sig AS (SELECT doc_id, {DUCK.minhash_sig('sh')} AS sig FROM sh),
    bands AS (
      SELECT doc_id, sig, i - 1 AS band_idx, bh[i] AS band_val
      FROM (SELECT doc_id, sig, {DUCK.band_hashes('sig')} AS bh FROM sig)
      CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS i) t
    )"""


def _spark_th_of(docs: DataFrame) -> DataFrame:
    """The shared signature-prelude stage: the >=3-token filter + token
    hashes, with ``lang`` kept for consumers that block on it.  Exposed so
    ops composing BOTH the signature chain and the shingle postings
    (op_corpus_minhash_eval) derive them from ONE frame — the Spark twin of
    the oracle-side convention where _duck_sig_cte() is the single CTE every
    minhash oracle composes."""
    filtered = docs.filter(F.size(F.split(F.lower("text"), " ")) >= 3)
    keep = ["doc_id"] + (["lang"] if "lang" in docs.columns else [])
    return filtered.select(
        *keep, F.expr(SPARK.token_hashes("text")).alias("th")
    )


def _spark_sigs_from_th(th: DataFrame) -> DataFrame:
    """token hashes -> shingles -> minhash signature (the chain after the
    prelude; see _spark_th_of)."""
    return (
        th.select("doc_id", F.expr(SPARK.shingle_hashes("th")).alias("sh"))
        .select("doc_id", F.expr(SPARK.minhash_sig("sh")).alias("sig"))
    )


def _spark_sigs_of(docs: DataFrame) -> DataFrame:
    return _spark_sigs_from_th(_spark_th_of(docs))


def _spark_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spark_sigs_of(load_spread(spark, sf_dir, "documents"))


@register(
    "op_dedup_minhash",
    f"""WITH {_duck_sig_cte()},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.sig AS sa, b.sig AS sb
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, {DUCK.sig_match_frac('sa', 'sb')} AS est_sim
    FROM pairs
    WHERE {DUCK.sig_match_frac('sa', 'sb')} >= 0.5""",
    doc="MinHash-LSH near-dup candidates: 3-token shingles -> 16-perm minhash "
    "-> 4x4 banding -> bucket self-join -> signature-estimated Jaccard >= 0.5. "
    "Pair work is bounded by band-bucket cardinality (never all-pairs); the "
    "shuffle key is (band_idx, band_val)",
)
def op_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = _spark_sigs(spark, sf_dir)
    bands = sigs.select(
        "doc_id", "sig",
        F.posexplode(F.expr(SPARK.band_hashes("sig"))).alias("band_idx", "band_val"),
    )
    # both self-join sides would re-run the full MinHash signature chain
    # (interpreted HOF hashing) — materialize the banded signatures once
    bands = shared(bands)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sa"),
            F.col("b.sig").alias("sb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("est_sim", F.expr(SPARK.sig_match_frac("sa", "sb")))
        .filter(F.col("est_sim") >= 0.5)
        .select("doc_a", "doc_b", "est_sim")
    )


# Hot-bucket cap for LSH self-joins: a viral near-duplicate (one document
# repeated n times) puts all n copies in the same (band_idx, band_val)
# bucket, and the plain self-join expands n(n-1)/2 pairs — the quadratic
# blow-up SCALE.md names as the known dedup risk.  Buckets over the cap
# instead emit star pairs (bucket-min doc vs each member): n-1 candidates,
# still signature-verified, and downstream connected components recovers
# the full cluster from the star exactly as it would from the clique.
_LSH_BUCKET_CAP = 8


def minhash_capped_pairs(docs: DataFrame, cap: int = _LSH_BUCKET_CAP) -> DataFrame:
    """Candidate near-dup pairs with per-bucket work capped at O(n)."""
    sigs = _spark_sigs_of(docs)
    bands = sigs.select(
        "doc_id", "sig",
        F.posexplode(F.expr(SPARK.band_hashes("sig"))).alias("band_idx", "band_val"),
    )
    # bucket size + representative in ONE window pass over the band shuffle
    # (an agg+join-back would re-execute the aggregate per consumer), then
    # materialize once: the annotated bands feed three branches (both clique
    # self-join sides + the star branch) and the interpreted HOF signature
    # chain must not re-run per branch.  min(struct(doc_id, sig)) orders by
    # the unique doc_id, so it is exactly arg_min(sig, doc_id).
    w = Window.partitionBy("band_idx", "band_val")
    bb = shared(
        bands.withColumn("n", F.count("*").over(w))
        .withColumn("rs", F.min(F.struct("doc_id", "sig")).over(w))
        .select(
            "doc_id", "sig", "band_idx", "band_val", "n",
            F.col("rs.doc_id").alias("rep"),
            F.col("rs.sig").alias("rep_sig"),
        )
    )
    small = bb.filter(F.col("n") <= cap)
    a, b = small.alias("a"), small.alias("b")
    clique = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.sig").alias("sa"),
        F.col("b.sig").alias("sb"),
    )
    star = (
        bb.filter((F.col("n") > cap) & (F.col("doc_id") != F.col("rep")))
        .select(
            F.col("rep").alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
            F.col("rep_sig").alias("sa"),
            F.col("sig").alias("sb"),
        )
    )
    return (
        clique.unionByName(star)
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("est_sim", F.expr(SPARK.sig_match_frac("sa", "sb")))
        .filter(F.col("est_sim") >= 0.5)
        .select("doc_a", "doc_b", "est_sim")
    )


@register(
    "op_dedup_minhash_capped",
    f"""WITH {_duck_sig_cte()},
    sizes AS (
      SELECT band_idx, band_val, count(*) AS n,
             min(doc_id) AS rep, arg_min(sig, doc_id) AS rep_sig
      FROM bands GROUP BY band_idx, band_val
    ),
    bb AS (
      SELECT bands.doc_id, bands.sig, bands.band_idx, bands.band_val,
             sizes.n, sizes.rep, sizes.rep_sig
      FROM bands JOIN sizes USING (band_idx, band_val)
    ),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sa, b.sig AS sb
      FROM bb a JOIN bb b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
      WHERE a.n <= {_LSH_BUCKET_CAP}
      UNION
      SELECT rep, doc_id, rep_sig, sig FROM bb
      WHERE n > {_LSH_BUCKET_CAP} AND doc_id <> rep
    )
    SELECT DISTINCT doc_a, doc_b, {DUCK.sig_match_frac('sa', 'sb')} AS est_sim
    FROM cand
    WHERE {DUCK.sig_match_frac('sa', 'sb')} >= 0.5""",
    doc="MinHash-LSH candidates with the hot-bucket cap EXERCISED: buckets "
    f"over {_LSH_BUCKET_CAP} members emit star pairs (bucket-min vs member, "
    "n-1 candidates) instead of the n(n-1)/2 clique — the viral-duplicate "
    "mitigation SCALE.md promises, as a first-class oracled op.  On corpora "
    "with no hot bucket the output equals op_dedup_minhash exactly; "
    "tests/test_scrub_sketch.py drives a 200-copy viral corpus through both "
    "engines and asserts linear pair work",
)
def op_dedup_minhash_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_capped_pairs(load_spread(spark, sf_dir, "documents"))


@register(
    "op_dedup_simhash",
    f"""WITH th AS (
      SELECT doc_id, {DUCK.token_hashes64('text')} AS th FROM documents
    ), s AS (SELECT doc_id, {DUCK.simhash('th')} AS simhash FROM th),
    blocks AS (
      SELECT doc_id, simhash, j, (simhash >> (16 * j)) & 65535 AS band
      FROM s CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) t
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           {DUCK.bitcount(DUCK.bxor('a.simhash', 'b.simhash'))} AS hamming
    FROM blocks a JOIN blocks b
      ON a.j = b.j AND a.band = b.band AND a.doc_id < b.doc_id
    WHERE {DUCK.bitcount(DUCK.bxor('a.simhash', 'b.simhash'))} <= 3""",
    doc="SimHash near-dup: 62-bit simhash over 62-bit token hashes; pairs "
    "within hamming distance 3 found via 4x16-bit band blocking (a pair "
    "with hamming<=3 must agree on >=1 band — pigeonhole); blocking keeps "
    "the self-join bucket-local.  16-bit bands (the op_multimodal_phash "
    "scheme) give 65,536 buckets per band, so candidate pairs stay "
    "~n^2/65536-bounded — the r13-era 4x8-bit scheme had a FIXED 256 "
    "buckets per band and measured super-linear at the 50x corpus probe "
    "(tools/probe_scale_curve.py; SCALE.md r14)",
)
def op_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id", F.expr(SPARK.token_hashes64("text")).alias("th")
    ).select("doc_id", F.expr(SPARK.simhash("th")).alias("simhash"))
    # materialize the signatures before the self-join: the r12 measurement
    # (single 32-fold simhash cheaper than the checkpoint round-trip)
    # FLIPPED with the 62-bit signature — recomputing 62 folds per side
    # costs more than the (doc_id, simhash) long-pair round-trip (measured
    # 1.16 -> 0.77 s at sf0.1, r14).  The checkpointed frame is two longs
    # per doc; on a cluster this is reliable checkpoint/Delta, the
    # op_dedup_components precedent.
    s = s.localCheckpoint(eager=False)
    blocks = s.select(
        "doc_id", "simhash", F.explode(F.expr("sequence(0, 3)")).alias("j")
    ).withColumn("band", F.expr("(simhash >> (16 * j)) & 65535"))
    a, b = blocks.alias("a"), blocks.alias("b")
    ham = F.expr(SPARK.bitcount(SPARK.bxor("a.simhash", "b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .distinct()
    )


@register(
    "op_dedup_ngram_jaccard",
    f"""WITH th AS (
      SELECT doc_id, lang, {DUCK.token_hashes('text')} AS th FROM documents
      WHERE len(string_split(lower(text), ' ')) >= 3
    ), sh0 AS (
      SELECT doc_id, lang, unnest({DUCK.shingle_hashes('th')}) AS h FROM th
    ), sh AS (SELECT DISTINCT doc_id, lang, h FROM sh0),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.h = b.h AND a.lang = b.lang
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.2""",
    doc="exact n-gram Jaccard pairs >= 0.2 via inverted shingle join blocked "
    "on (lang, shingle): candidate pairs share >=1 shingle, so pair work "
    "scales with posting-list sizes, not |docs|^2; the LSH verifier twin",
)
def op_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents").filter(
        F.size(F.split(F.lower("text"), " ")) >= 3
    )
    sh = (
        docs.select(
            "doc_id", "lang", F.expr(SPARK.token_hashes("text")).alias("th")
        )
        .select("doc_id", "lang", F.explode(F.expr(SPARK.shingle_hashes("th"))).alias("h"))
        .distinct()
    )
    # materialize the posting list ONCE: it feeds three consumers (both join
    # sides + sizes) and the shingle hashing is interpreted HOF arithmetic —
    # without this the plan re-evaluates it per branch (no exchange reuse
    # across the self-join); measured ~30% off the op at sf0.1
    sh = shared(sh)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    # pair generation stays the posting SELF-JOIN, deliberately (r16): the
    # grouped-array generator that wins in op_orders_market_basket was
    # A/B'd here and REJECTED on the multi-point curve — sf0.1 wash (the
    # shared() cache already makes the second join exchange a
    # ReusedExchange), x0.58 at 10 copies, but x1.15 WORSE at 50 copies
    # with an INCREASING slope (0.12->0.23->0.33 s/copy vs this shape's
    # flat 0.10): collect_set over the (lang, shingle) key space degrades
    # at high group cardinality (vocab x copies groups; sort-based
    # ObjectHashAggregate fallback, and a raised fallback threshold
    # measured worse still).  The generator wins only where the group-key
    # cardinality is data-bounded (orders); posting vocabularies are not.
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("i"))
    )
    jac = F.col("i").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("i")
    ).cast("double")
    return (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.2)
    )


#: stop-shingle document-frequency cap: shingles seen in more than this many
#: docs (per lang) carry no dedup signal and quadratic pair cost — drop them.
#: The shipped corpus tops out at df=14 (sf0.1), so at test scale the capped
#: op's output EQUALS the uncapped one (tested); the cap exists for the
#: 100 TB case where one viral boilerplate shingle (df=10^6) would otherwise
#: put 10^12 pairs through a single reducer.
_NGRAM_DF_CAP = 16


@register(
    "op_dedup_ngram_capped",
    f"""WITH th AS (
      SELECT doc_id, lang, {DUCK.token_hashes('text')} AS th FROM documents
      WHERE len(string_split(lower(text), ' ')) >= 3
    ), sh0 AS (
      SELECT doc_id, lang, unnest({DUCK.shingle_hashes('th')}) AS h FROM th
    ), shd AS (SELECT DISTINCT doc_id, lang, h FROM sh0),
    sh AS (
      SELECT doc_id, lang, h FROM (
        SELECT doc_id, lang, h,
               count(*) OVER (PARTITION BY lang, h) AS df FROM shd
      ) WHERE df <= {_NGRAM_DF_CAP}
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.h = b.h AND a.lang = b.lang
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.2""",
    doc="df-capped stop-shingle variant of op_dedup_ngram_jaccard: shingles "
    f"with document frequency > {_NGRAM_DF_CAP} (per lang) are dropped "
    "before the posting-list self-join, so pair work is bounded by "
    "cap x |postings| instead of the unbounded hot-shingle df^2; Jaccard is "
    "computed on the reduced shingle sets (sizes AND intersections both "
    "post-filter, a true Jaccard of the capped representation).  On the "
    "shipped corpus (max df 14 at sf0.1) the output is IDENTICAL to the "
    "uncapped twin — the cap only bites on viral boilerplate (tested on a "
    "200-copy corpus).  The df annotation is one window pass over the "
    "posting shuffle, same trick as op_dedup_minhash_capped's bucket stats",
)
def op_dedup_ngram_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents").filter(
        F.size(F.split(F.lower("text"), " ")) >= 3
    )
    return ngram_capped_pairs(docs)


def ngram_capped_pairs(docs: DataFrame, cap: int = _NGRAM_DF_CAP) -> DataFrame:
    """Exact-Jaccard near-dup pairs over df-capped shingle posting lists."""
    shd = (
        docs.select(
            "doc_id", "lang", F.expr(SPARK.token_hashes("text")).alias("th")
        )
        .select(
            "doc_id", "lang", F.explode(F.expr(SPARK.shingle_hashes("th"))).alias("h")
        )
        .distinct()
    )
    # df annotation + stop-shingle filter in one window pass, then materialize
    # ONCE: the filtered postings feed three consumers (both self-join sides +
    # sizes) and the shingle hashing is interpreted HOF arithmetic (same
    # rationale as the uncapped op's shared cache)
    sh = shared(
        shd.withColumn("df", F.count("*").over(Window.partitionBy("lang", "h")))
        .filter(F.col("df") <= cap)
        .drop("df")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    jac = F.col("i").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("i")
    ).cast("double")
    return (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.2)
    )


#: containment threshold: |A∩B| / min(|A|,|B|) — a short document quoted
#: verbatim inside a long one scores ~1.0 here while its Jaccard is tiny
#: (|A∩B| / |A∪B| is diluted by the long doc's extra shingles), so this is
#: the dedup lens that catches SUBSET duplication (boilerplate blocks,
#: quoted passages, page-in-page wrappers) that the Jaccard family misses.
_CONTAIN_TAU = 0.6


@register(
    "op_dedup_containment",
    f"""WITH th AS (
      SELECT doc_id, lang, {DUCK.token_hashes('text')} AS th FROM documents
      WHERE len(string_split(lower(text), ' ')) >= 3
    ), sh0 AS (
      SELECT doc_id, lang, unnest({DUCK.shingle_hashes('th')}) AS h FROM th
    ), sh AS (SELECT DISTINCT doc_id, lang, h FROM sh0),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.h = b.h AND a.lang = b.lang
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(i AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE) AS containment
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(i AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE)
          >= {_CONTAIN_TAU}""",
    doc="shingle CONTAINMENT pairs (Broder's containment coefficient, "
    "'On the resemblance and containment of documents', SEQUENCES'97): "
    f"|A∩B| / min(|A|,|B|) >= {_CONTAIN_TAU} over the same (lang, shingle) "
    "inverted-posting blocking as op_dedup_ngram_jaccard — the subset-"
    "duplication lens (a quoted passage or boilerplate block contained in "
    "a longer page scores ~1 here while its Jaccard is diluted toward 0 "
    "by the container's extra shingles).  Same scale shape as the Jaccard "
    "twin: candidate pairs share >=1 shingle so pair work is posting-list-"
    "bounded, the min() denominator is one extra broadcast-free column, "
    "and the division is a single exact-int op — bit-identical across "
    "engines.  At 100 TB apply the df cap exactly as op_dedup_ngram_capped",
)
def op_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents").filter(
        F.size(F.split(F.lower("text"), " ")) >= 3
    )
    return containment_pairs(docs)


def containment_pairs(docs: DataFrame, tau: float = _CONTAIN_TAU) -> DataFrame:
    """Shingle-containment pairs >= tau over (lang, shingle) postings."""
    sh = shared(
        docs.select(
            "doc_id", "lang", F.expr(SPARK.token_hashes("text")).alias("th")
        )
        .select(
            "doc_id", "lang",
            F.explode(F.expr(SPARK.shingle_hashes("th"))).alias("h"),
        )
        .distinct()
    )  # three consumers (both self-join sides + sizes); HOF hashing runs once
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    # posting SELF-JOIN kept — same r16 curve-probe rejection of the
    # grouped-array generator as op_dedup_ngram_jaccard (see its comment)
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    cont = F.col("i").cast("double") / F.least(
        F.col("sa.n"), F.col("sb.n")
    ).cast("double")
    return (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", cont.alias("containment"))
        .filter(F.col("containment") >= tau)
    )


@register(
    "op_dedup_embedding",
    f"""WITH e AS (
      SELECT vec_id, label, embedding,
             {duckdb_norm2_fold('embedding')} AS n2 FROM embeddings
    ), scored AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
             ({duckdb_dot_fold('a.embedding', 'b.embedding')})
               / sqrt(a.n2 * b.n2) AS cos_sim
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, label, cos_sim FROM scored WHERE cos_sim >= 0.35""",
    doc="embedding-cosine near-dup pairs >= 0.35, blocked on label (the coarse "
    "cluster id): ONE data shuffle on the (block, salt-grid) key, then a "
    "vectorized numpy all-pairs kernel per group (applyInPandas) "
    "accumulating dim-sequentially — the same op order as the fold oracle, "
    "so results stay bit-identical while the batch kernel replaces per-pair "
    "codegen array access (~10x, measured r2). At 100 TB the label block is "
    "the IVF cell — pair work is sum over cells of |cell|^2, row-tiled to "
    "bound memory, and a block beyond CELL_CAP rows sub-splits on a "
    "deterministic salt (triangle partitioning, functions/vectors.py "
    "_salted_blocks) so a hot cell spans ~(n/cap)^2/2 tasks instead of one "
    "— identical pair set, bit-identical cos_sim (r13; pinned by "
    "tests/test_vectors_split.py)",
)
def op_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_spread(spark, sf_dir, "embeddings")
    return cos_block_pairs(emb, threshold=0.35)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_N_QUERIES = 8
_TOP_K = 10


@register(
    "op_sim_topk",
    f"""WITH en AS (
      SELECT vec_id, embedding, {duckdb_norm2_fold('embedding')} AS n2
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qe, n2 AS nq FROM en
          WHERE vec_id < {_N_QUERIES}),
    scored AS (
      SELECT q.query_id, e.vec_id,
             ({duckdb_dot_fold('q.qe', 'e.embedding')}) / sqrt(q.nq * e.n2)
               AS cos_sim
      FROM q JOIN en e ON q.query_id <> e.vec_id
    )
    SELECT query_id, vec_id, cos_sim, rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, vec_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= {_TOP_K}""",
    doc="brute-force cosine top-k (k=10) for 8 query vectors: the query "
    "matrix ships to executors in the task closure (the Spark analog of "
    "broadcasting a parameter table), the corpus streams through ONE "
    "mapInPandas Arrow pass with numpy dim-sequential dots (bit-identical "
    "to the fold oracle), then one shuffle for the per-query top-k window; "
    "ties broken by vec_id for determinism. The exact baseline the ANN "
    "variant is measured against",
)
def op_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    emb = load_spread(spark, sf_dir, "embeddings")
    # parameter probe off the RAW scan: the vec_id filter pushes into the
    # parquet scan (one stage, a handful of rows) — collecting through the
    # spread frame would pay its round-robin exchange at plan-build time
    qrows = sorted(
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    scored = cos_scores_queries(emb, qids, Q)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "vec_id", "cos_sim", "rnk")
    )


_RANGE_TAU = 0.3  # cosine radius for range search


@register(
    "op_sim_range_search",
    f"""WITH en AS (
      SELECT vec_id, embedding, {duckdb_norm2_fold('embedding')} AS n2
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qe, n2 AS nq FROM en
          WHERE vec_id < {_N_QUERIES})
    SELECT query_id, vec_id, cos_sim FROM (
      SELECT q.query_id, e.vec_id,
             ({duckdb_dot_fold('q.qe', 'e.embedding')}) / sqrt(q.nq * e.n2)
               AS cos_sim
      FROM q JOIN en e ON q.query_id <> e.vec_id
    ) WHERE cos_sim >= {_RANGE_TAU}""",
    doc=f"radius (range) similarity search: every corpus vector within "
    f"cosine >= {_RANGE_TAU} of each of the {_N_QUERIES} query vectors — "
    "the retrieval mode top-k can't express (result size driven by the "
    "data, not k).  Same broadcast-queries + one-Arrow-pass corpus scan as "
    "op_sim_topk but with NO shuffle at all: the radius predicate filters "
    "inside the scan stage, so at 100 TB the cost is exactly one pass over "
    "the embeddings",
)
def op_sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    emb = load_spread(spark, sf_dir, "embeddings")
    # parameter probe off the RAW scan: the vec_id filter pushes into the
    # parquet scan (one stage, a handful of rows) — collecting through the
    # spread frame would pay its round-robin exchange at plan-build time
    qrows = sorted(
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    return (
        cos_scores_queries(emb, qids, Q)
        .filter(F.col("cos_sim") >= _RANGE_TAU)
        .select("query_id", "vec_id", "cos_sim")
    )


_LSH_PLANES = 4  # 16 sign buckets; bucket ~= |corpus|/16 vectors


def _sign_bucket(dialect, vec: str) -> str:
    """Sign-random-projection bucket id from deterministic ±1 hyperplanes.

    Plane p weight for dim d: parity of (a_p*(d) + b_p) mod P mapped to ±1,
    with (a_p, b_p) the first _LSH_PLANES minhash perm constants.  The
    projection is a sequential double fold => bit-identical across engines.
    """
    from daq_3i_spark.functions.text import MINHASH_PERMS

    bits = []
    for p in range(_LSH_PLANES):
        a, b = MINHASH_PERMS[p]
        w = f"(CAST(2 * ((({a} * CAST(__d AS BIGINT) + {b}) % {P}) % 2) - 1 AS DOUBLE))"
        proj = dialect.fold_double(
            dialect.transform(
                dialect.seq1n("64"),
                "__d",
                f"{w} * CAST({dialect.at(vec, '__d')} AS DOUBLE)",
            ),
            "0",
            "__acc",
            "__v",
            "__acc + __v",
        )
        bits.append(f"(CASE WHEN ({proj}) > CAST(0 AS DOUBLE) THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


@register(
    "op_sim_lsh_topk",
    f"""WITH bk AS (SELECT vec_id, label, embedding,
                  {duckdb_norm2_fold('embedding')} AS n2,
                  {_sign_bucket(DUCK, 'embedding')} AS bucket FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS qe, n2 AS nq, bucket AS qb
          FROM bk WHERE vec_id < {_N_QUERIES}),
    scored AS (
      SELECT q.query_id, e.vec_id,
             ({duckdb_dot_fold('q.qe', 'e.embedding')}) / sqrt(q.nq * e.n2)
               AS cos_sim
      FROM q JOIN bk e ON q.qb = e.bucket AND q.query_id <> e.vec_id
    )
    SELECT query_id, vec_id, cos_sim, rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, vec_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= {_TOP_K}""",
    doc="LSH-bucketed ANN top-k: 4 deterministic sign-projection hyperplanes "
    "-> 16 buckets; each query scores only its own bucket (~1/16 of the "
    "corpus) with the fold cosine. The 100 TB scale path vs op_sim_topk's "
    "exact scan: shuffle key is the bucket id, and recall trades off "
    "against _LSH_PLANES",
)
def op_sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from daq_3i_spark.functions.text import MINHASH_PERMS

    emb = load_spread(spark, sf_dir, "embeddings")
    # parameter probe off the RAW scan: the vec_id filter pushes into the
    # parquet scan (one stage, a handful of rows) — collecting through the
    # spread frame would pay its round-robin exchange at plan-build time
    qrows = sorted(
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)

    def bucket_fn(B):
        return sign_buckets_np(B, MINHASH_PERMS, P, _LSH_PLANES)

    scored = cos_scores_queries(
        emb, qids, Q, q_buckets=bucket_fn(Q), bucket_fn=bucket_fn
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "vec_id", "cos_sim", "rnk")
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@register(
    "op_text_stats",
    """WITH t AS (
      SELECT lang, source, n_chars,
             len(string_split(lower(text), ' ')) AS n_tokens
      FROM documents
    )
    SELECT lang, source, count(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(n_chars) AS DOUBLE) / count(*) AS avg_chars,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / count(*) AS avg_tokens,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM t GROUP BY lang, source""",
    doc="corpus stats per (lang, source): doc/char/token counts — one "
    "map-side-combined hash aggregate over a narrow projection",
)
def op_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    t = docs.select(
        "lang", "source", "n_chars",
        F.size(F.split(F.lower("text"), " ")).alias("n_tokens"),
    )
    return t.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.sum("n_tokens").alias("sum_tokens"),
        (F.sum("n_tokens").cast("double") / F.count("*")).alias("avg_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "op_text_tokens",
    """SELECT doc_id,
           len(string_split(lower(text), ' ')) AS n_ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words,
           len(list_distinct(string_split(lower(text), ' '))) AS n_uniq_tokens,
           CAST(length(replace(lower(text), ' ', '')) AS DOUBLE)
             / len(string_split(lower(text), ' ')) AS avg_token_len
    FROM documents""",
    doc="token counting per doc: whitespace tokens, regex word tokens "
    "(the BPE-ish [a-z0-9]+ pass), distinct tokens, mean token length — all "
    "narrow codegen'd projections, no shuffle",
)
def op_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_ws_tokens"),
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("n_words"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
        (
            F.length(F.replace(F.lower("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(toks)
        ).alias("avg_token_len"),
    )


# function-word marker lists for the n-gram/stopword language-ID heuristic.
# On the synthetic corpus every lang shares one English-ish vocabulary, so
# predictions skew 'en' — the *mechanism* (marker-hit argmax with
# deterministic tie-break) is what the operator demonstrates.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "en", "los"),
    "fr": ("le", "la", "de", "et", "un", "les", "des"),
    "de": ("der", "die", "das", "und", "ist", "ein", "mit"),
    "zh": ("de", "shi", "le", "zai", "he", "you", "wo"),
}


def _langid_hits(dialect, toks: str, lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return dialect.size(dialect.filt(toks, "__t", f"__t IN ({lst})"))


def _langid_pred(dialect, toks: str) -> str:
    """argmax over marker hits, ties broken by lang code order."""
    langs = sorted(_LANG_MARKERS)
    hits = {lang: _langid_hits(dialect, toks, lang) for lang in langs}
    # pred = first lang (in sorted order) whose hits >= all others
    conds = []
    for lang in langs:
        ge_all = " AND ".join(
            f"({hits[lang]}) >= ({hits[o]})" for o in langs if o != lang
        )
        conds.append(f"WHEN {ge_all} THEN '{lang}'")
    return "CASE " + " ".join(conds) + " ELSE 'und' END"


@register(
    "op_text_langid",
    f"""WITH t AS (
      SELECT doc_id, lang, string_split(lower(text), ' ') AS toks FROM documents
    )
    SELECT doc_id, lang, {_langid_pred(DUCK, 'toks')} AS pred_lang FROM t""",
    doc="heuristic language-ID: function-word marker hits per language, "
    "argmax with lexicographic tie-break; a pure projection (the marker "
    "lists are literals, so no join)",
)
def op_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", F.split(F.lower("text"), " ").alias("toks")
    ).select("doc_id", "lang", F.expr(_langid_pred(SPARK, "toks")).alias("pred_lang"))


@register(
    "op_text_quality",
    """WITH t AS (
      SELECT doc_id,
             len(string_split(lower(text), ' ')) AS n_tokens,
             len(list_distinct(string_split(lower(text), ' '))) AS n_uniq,
             len(list_filter(string_split(lower(text), ' '),
                 __t -> length(__t) <= 2)) AS n_short,
             len(regexp_extract_all(lower(text), '[a-z]'))      AS n_alpha,
             length(text) AS n_len
      FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(n_uniq AS DOUBLE) / n_tokens AS uniq_ratio,
           CAST(n_short AS DOUBLE) / n_tokens AS short_ratio,
           CAST(n_alpha AS DOUBLE) / n_len AS alpha_ratio,
           CAST(0.4 AS DOUBLE) * least(CAST(n_tokens AS DOUBLE) / 50.0, CAST(1 AS DOUBLE))
             + CAST(0.3 AS DOUBLE) * (CAST(n_uniq AS DOUBLE) / n_tokens)
             + CAST(0.3 AS DOUBLE) * (CAST(n_alpha AS DOUBLE) / n_len) AS quality_score
    FROM t""",
    doc="per-doc quality scoring: length / lexical-diversity / alphabetic "
    "ratios combined into one score — the pre-training corpus filter "
    "primitive; all double arithmetic applied in a fixed order so the "
    "oracle matches exactly",
)
def op_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    t = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.size(F.filter(toks, lambda x: F.length(x) <= 2)).alias("n_short"),
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z]', 0)")).alias("n_alpha"),
        F.length("text").alias("n_len"),
    )
    uniq_ratio = F.col("n_uniq").cast("double") / F.col("n_tokens")
    alpha_ratio = F.col("n_alpha").cast("double") / F.col("n_len")
    score = (
        F.lit(0.4) * F.least(F.col("n_tokens").cast("double") / F.lit(50.0), F.lit(1.0))
        + F.lit(0.3) * uniq_ratio
        + F.lit(0.3) * alpha_ratio
    )
    return t.select(
        "doc_id",
        "n_tokens",
        uniq_ratio.alias("uniq_ratio"),
        (F.col("n_short").cast("double") / F.col("n_tokens")).alias("short_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        score.alias("quality_score"),
    )


_WINNOW_W = 4


@register(
    "op_text_fingerprint",
    f"""WITH th AS (
      SELECT doc_id, {DUCK.token_hashes('text')} AS th FROM documents
      WHERE len(string_split(lower(text), ' ')) >= 3
    ), sh AS (SELECT doc_id, {DUCK.shingle_hashes('th')} AS sh FROM th)
    SELECT doc_id, len(sh) AS n_shingles,
           array_to_string(list_sort(list_distinct(list_transform(
             generate_series(1, greatest(len(sh) - {_WINNOW_W - 1}, 1)),
             i -> list_min(sh[i:i+{_WINNOW_W - 1}])))), ',') AS fingerprints
    FROM sh""",
    doc="winnowing document fingerprints: 3-token shingle rolling hashes, "
    "min over each window of 4, distinct+sorted, serialized as a "
    "comma-joined string (scalar column: the driver's canonicalizer can't "
    "hash array cells); narrow projection, no shuffle",
)
def op_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents").filter(
        F.size(F.split(F.lower("text"), " ")) >= 3
    )
    win_min = (
        f"array_join(transform(array_sort(array_distinct(transform("
        f"{SPARK.seq1n(f'greatest(size(sh) - {_WINNOW_W - 1}, 1)')},"
        f" i -> array_min(slice(sh, i, {_WINNOW_W}))))), x -> cast(x as string)), ',')"
    )
    return (
        docs.select("doc_id", F.expr(SPARK.token_hashes("text")).alias("th"))
        .select("doc_id", F.expr(SPARK.shingle_hashes("th")).alias("sh"))
        .select(
            "doc_id",
            F.size("sh").alias("n_shingles"),
            F.expr(win_min).alias("fingerprints"),
        )
    )


# ---------------------------------------------------------------------------
# multimodal columns
# ---------------------------------------------------------------------------


@register(
    "op_multimodal_pack",
    """SELECT doc_id, 'text/plain' AS mime,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents""",
    doc="multimodal packing: content as an opaque binary payload column with "
    "typed metadata (mime, byte length, content digest) — the schema pattern "
    "for image/audio/video blobs; md5 and octet_length verified identical "
    "across engines",
)
def op_multimodal_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    payload = F.expr("encode(text, 'utf-8')")
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("mime"),
        F.octet_length(payload).alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
    )


# DuckDB has no byte-iteration over BLOBs; the oracle kernel extracts the
# byte list through hex() — element i is the pair of hex digits 2i-1, 2i.
_BYTES_KERNEL = (
    "list_transform(range(1, octet_length(payload) + 1), i ->"
    " (strpos('0123456789ABCDEF', substr(hex(payload), 2*i-1, 1)) - 1) * 16"
    " + (strpos('0123456789ABCDEF', substr(hex(payload), 2*i, 1)) - 1))"
)


@register(
    "op_multimodal_features",
    f"""WITH p AS (
      SELECT doc_id, 'text/plain' AS mime, encode(text) AS payload
      FROM documents
    ), b AS (
      SELECT doc_id, mime, octet_length(payload) AS n,
             {_BYTES_KERNEL} AS bl
      FROM p
    ), agg AS (
      SELECT doc_id, mime, n,
             CAST(list_sum(bl) AS BIGINT) AS s,
             CAST(list_sum(list_transform(bl, x -> x * x)) AS BIGINT) AS s2,
             list_min(bl) AS mn, list_max(bl) AS mx,
             len(list_filter(bl, x -> x > 127)) AS gt,
             bl[1] AS fst, bl[n] AS lst
      FROM b
    ), f AS (
      SELECT doc_id, mime, n, mn, mx, gt, fst, lst,
             CAST(s AS DOUBLE) / n AS mu,
             CAST(s2 AS DOUBLE) / n
               - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n) AS var
      FROM agg
    )
    SELECT doc_id, mime, CAST(n AS INTEGER) AS n_bytes,
           CAST(n AS REAL) AS f0,
           CASE WHEN n = 0 THEN CAST(0 AS REAL) ELSE CAST(mu AS REAL) END AS f1,
           CASE WHEN n = 0 THEN CAST(0 AS REAL) ELSE
             CAST(CASE WHEN var > 0 THEN sqrt(var) ELSE 0 END AS REAL) END AS f2,
           CASE WHEN n = 0 THEN CAST(0 AS REAL) ELSE CAST(mn AS REAL) END AS f3,
           CASE WHEN n = 0 THEN CAST(0 AS REAL) ELSE CAST(mx AS REAL) END AS f4,
           CASE WHEN n = 0 THEN CAST(0 AS REAL) ELSE
             CAST(CAST(gt AS DOUBLE) / n AS REAL) END AS f5,
           CASE WHEN n = 0 THEN CAST(0 AS REAL) ELSE CAST(fst AS REAL) END AS f6,
           CASE WHEN n = 0 THEN CAST(0 AS REAL) ELSE CAST(lst AS REAL) END AS f7
    FROM f""",
    # oracle-matchable by construction: every feature derives from EXACT
    # integer aggregates through a fixed tree of correctly-rounded IEEE ops
    # (functions/multimodal.py:_byte_features), then one double->float32
    # rounding on each side
    doc="multimodal feature extraction over binary payloads via mapInPandas "
    "(Arrow-batched, numpy per batch, no shuffle): deterministic 8-dim "
    "byte-statistics features projected to scalar columns f0..f7 (the "
    "driver's canonicalizer can't hash array cells), fully hash-oracled "
    "against a DuckDB re-derivation over hex(payload).  Real image decode "
    "lives in op_multimodal_decode",
)
def op_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from daq_3i_spark.functions.multimodal import FEATURE_DIM, extract_features

    docs = load_spread(spark, sf_dir, "documents")
    packed = docs.select(
        "doc_id",
        F.lit("text/plain").alias("mime"),
        F.expr("encode(text, 'utf-8')").alias("payload"),
    )
    feats = extract_features(packed)
    return feats.select(
        "doc_id",
        "mime",
        "n_bytes",
        *[F.get("features", i).alias(f"f{i}") for i in range(FEATURE_DIM)],
    )


_PPM_W, _PPM_H = 4, 3
_PPM_BODY = _PPM_W * _PPM_H * 3  # 36 raw RGB bytes
_PPM_HEADER = f"P6\n{_PPM_W} {_PPM_H}\n255\n".encode()


@register(
    "op_multimodal_decode",
    f"""WITH p AS (
      SELECT doc_id, encode(text) AS payload FROM documents
    ), b AS (
      SELECT doc_id, octet_length(payload) AS n,
             {_BYTES_KERNEL} AS bl
      FROM p
    ), body AS (
      SELECT doc_id,
             list_transform(range(1, {_PPM_BODY} + 1),
               i -> CASE WHEN i <= n THEN bl[i] ELSE 0 END) AS px
      FROM b
    )
    SELECT doc_id,
           CAST({_PPM_W} AS INTEGER) AS width,
           CAST({_PPM_H} AS INTEGER) AS height,
           CAST(255 AS INTEGER) AS maxval,
           CAST(CAST(list_sum(px) AS BIGINT) AS DOUBLE) / {_PPM_BODY} AS px_mean,
           CAST(CAST(list_sum(list_filter(px, (x, i) -> i % 3 = 1)) AS BIGINT)
             AS DOUBLE) / {_PPM_W * _PPM_H} AS r_mean,
           CAST(CAST(list_sum(list_filter(px, (x, i) -> i % 3 = 2)) AS BIGINT)
             AS DOUBLE) / {_PPM_W * _PPM_H} AS g_mean,
           CAST(CAST(list_sum(list_filter(px, (x, i) -> i % 3 = 0)) AS BIGINT)
             AS DOUBLE) / {_PPM_W * _PPM_H} AS b_mean
    FROM body""",
    # the oracle never parses PPM: it recomputes the expected pixel stats
    # straight from the known body bytes (text bytes zero-padded to 36), so
    # the Spark side's header construction + decode_media parse + reshape is
    # verified end-to-end against an independent derivation
    doc="REAL image decode through the multimodal pipeline: each document's "
    f"bytes are framed as a {_PPM_W}x{_PPM_H} binary PPM (P6) image "
    "(header + zero-padded RGB body), decoded by the pure-numpy netpbm "
    "parser (functions/multimodal.py:decode_media — magic, dims, maxval, "
    "offset, reshape to HxWxC), and reduced to per-image / per-channel "
    "pixel means via exact integer sums.  mapInPandas Arrow batches, no "
    "shuffle; the decode is no longer a stub",
)
def op_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from daq_3i_spark.functions.multimodal import decode_media

    docs = load_spread(spark, sf_dir, "documents")
    body = F.substring(
        F.concat(F.expr("encode(text, 'utf-8')"), F.lit(bytearray(_PPM_BODY))),
        1,
        _PPM_BODY,
    )
    packed = docs.select(
        "doc_id", F.concat(F.lit(bytearray(_PPM_HEADER)), body).alias("payload")
    )

    schema = (
        "doc_id long, width int, height int, maxval int, "
        "px_mean double, r_mean double, g_mean double, b_mean double"
    )

    def run(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "width", "height", "maxval",
                "px_mean", "r_mean", "g_mean", "b_mean",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_media(bytes(payload), "image/x-portable-pixmap")
                h, w, c = img.shape
                flat = img.astype(np.int64)
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["maxval"].append(255)
                out["px_mean"].append(int(flat.sum()) / (h * w * c))
                out["r_mean"].append(int(flat[:, :, 0].sum()) / (h * w))
                out["g_mean"].append(int(flat[:, :, 1].sum()) / (h * w))
                out["b_mean"].append(int(flat[:, :, 2].sum()) / (h * w))
            yield pd.DataFrame(out)

    return packed.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# event-time windowing (batch twins of the streaming ops)
# ---------------------------------------------------------------------------


@register(
    "op_window_agg_events",
    """SELECT epoch_us(time_bucket(INTERVAL '1 minute', ts)) AS window_start_us,
           epoch_us(time_bucket(INTERVAL '1 minute', ts) + INTERVAL '1 minute')
             AS window_end_us,
           event_type, count(*) AS n_events,
           (CAST(CAST(SUM(CAST(FLOOR((value) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e6) AS sum_value
    FROM events GROUP BY 1, 2, 3""",
    doc="tumbling 1-minute event-time windows per event_type (batch twin of "
    "streaming/pipeline.py's windowed aggregation; epoch-aligned in both "
    "engines); window bounds emitted as epoch-micros BIGINT — engine- and "
    "canonicalizer-neutral (r1 driver hash diverged on raw timestamp "
    "columns here); one hash aggregate, partial map-side",
)
def op_window_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            fx_sum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            F.unix_micros("w.end").alias("window_end_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_SESSION_GAP_S = 600  # 10 minutes


@register(
    "op_session_window_batch",
    f"""WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_SESSION_GAP_S} * 1000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM o
    )
    SELECT user_id, session_id, count(*) AS n_events,
           CAST(min(ts) AS TIMESTAMP) AS session_start,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
    FROM s GROUP BY user_id, session_id""",
    doc="gap-based sessionization (10-min inactivity gap) per user over "
    "events — the batch twin of F.session_window in the streaming path; "
    "lag + running-sum + aggregate, all in ONE shuffle on user_id (the "
    "window and groupBy share partitioning, so Catalyst reuses the exchange)",
)
def op_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ws = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    prev = F.lag("ts").over(wo)
    new_s = F.when(
        prev.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev) > _SESSION_GAP_S * 1_000_000),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("new_s", new_s)
        .withColumn("session_id", F.sum("new_s").over(ws))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
                "duration_us"
            ),
        )
    )


# ---------------------------------------------------------------------------
# time-series joins (operators Spark lacks natively — operators/timeseries.py)
# ---------------------------------------------------------------------------

from daq_3i_spark.sources.daq_dims import channels_df, channel_data_df, dims_cte_sql  # noqa: E402

_DIMS = dims_cte_sql()


@register(
    "op_asof_join",
    f"""WITH {_DIMS},
    q AS (SELECT id AS qid, channel_id, ts FROM channel_data WHERE id % 20 = 0)
    SELECT q.qid, q.channel_id, q.ts,
           (SELECT r.value FROM channel_data r
             WHERE r.channel_id = q.channel_id AND r.ts < q.ts
             ORDER BY r.ts DESC, r.id DESC LIMIT 1) AS asof_value
    FROM q""",
    doc="as-of join (DuckDB ASOF JOIN / pandas merge_asof — no Spark "
    "built-in): latest sample strictly before each query time per channel, "
    "via the union+window trick (operators/timeseries.py): ONE shuffle on "
    "the key, last(ignorenulls) over unbounded-preceding — never a "
    "nested-loop range predicate",
)
def op_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from daq_3i_spark.operators.timeseries import asof_join

    cd = channel_data_df(spark, sf_dir)
    queries = cd.filter(F.col("id") % 20 == 0).select(
        F.col("id").alias("qid"), "channel_id", "ts"
    )
    return asof_join(queries, cd, key="channel_id", ts="ts", value_cols=("value",))


@register(
    "op_range_join",
    f"""WITH {_DIMS},
    ivl AS (
      SELECT id AS channel_id,
             TIMESTAMP '2024-01-01 00:00:00' + ((id*5)%36) * INTERVAL 1 HOUR
               AS interval_start,
             TIMESTAMP '2024-01-01 00:00:00' + (((id*5)%36)+2) * INTERVAL 1 HOUR
               AS interval_end
      FROM channels
    )
    SELECT i.channel_id, i.interval_start, cd.id, cd.ts, cd.value
    FROM ivl i JOIN channel_data cd ON cd.channel_id = i.channel_id
     AND cd.ts >= i.interval_start AND cd.ts < i.interval_end""",
    doc="range join (interval containment — Spark would plan a non-equi "
    "nested loop): per-channel 2-hour maintenance windows joined to samples "
    "inside them via hour-bucket explode + equi-join + exact refine "
    "(operators/timeseries.py) — work scales with interval/bucket width, "
    "not |intervals| x |samples|",
)
def op_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from daq_3i_spark.operators.timeseries import range_join

    base = "timestamp'2024-01-01 00:00:00'"
    ivl = channels_df(spark).select(
        F.col("id").alias("channel_id"),
        F.expr(f"{base} + make_interval(0, 0, 0, 0, pmod(id*5, 36), 0, 0)").alias(
            "interval_start"
        ),
        F.expr(f"{base} + make_interval(0, 0, 0, 0, pmod(id*5, 36) + 2, 0, 0)").alias(
            "interval_end"
        ),
    )
    cd = channel_data_df(spark, sf_dir)
    return range_join(ivl, cd, key="channel_id").select(
        "channel_id", "interval_start", "id", "ts", "value"
    )


# ---------------------------------------------------------------------------
# the corpus-cleaning pipeline (the LLM-data flagship: compose the kernels)
# ---------------------------------------------------------------------------


@register(
    "op_corpus_clean_pipeline",
    f"""WITH survivors0 AS (
      SELECT doc_id, lang, source, n_chars, text,
             len(string_split(lower(text), ' ')) AS n_tokens,
             len(list_distinct(string_split(lower(text), ' '))) AS n_uniq,
             len(regexp_extract_all(lower(text), '[a-z]')) AS n_alpha,
             length(text) AS n_len
      FROM documents
    ), survivors1 AS (  -- quality gate
      SELECT doc_id, lang, source, n_chars, text FROM survivors0
      WHERE CAST(0.4 AS DOUBLE) * least(CAST(n_tokens AS DOUBLE) / CAST(50 AS DOUBLE),
                                        CAST(1 AS DOUBLE))
          + CAST(0.3 AS DOUBLE) * (CAST(n_uniq AS DOUBLE) / n_tokens)
          + CAST(0.3 AS DOUBLE) * (CAST(n_alpha AS DOUBLE) / n_len) >= 0.6
    ), survivors2 AS (  -- exact dedup, keep min doc_id per normalized text
      SELECT s.* FROM survivors1 s
      JOIN (SELECT min(doc_id) AS doc_id
            FROM (SELECT doc_id, regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g') AS norm
                  FROM survivors1) GROUP BY norm) k USING (doc_id)
    ), th AS (
      SELECT doc_id, {DUCK.token_hashes('text')} AS th FROM survivors2
      WHERE len(string_split(lower(text), ' ')) >= 3
    ), sh AS (SELECT doc_id, {DUCK.shingle_hashes('th')} AS sh FROM th),
    sig AS (SELECT doc_id, {DUCK.minhash_sig('sh')} AS sig FROM sh),
    bands AS (
      SELECT doc_id, sig, i - 1 AS band_idx, bh[i] AS band_val
      FROM (SELECT doc_id, sig, {DUCK.band_hashes('sig')} AS bh FROM sig)
      CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS i) t
    ), sizes AS (  -- hot-bucket cap: same construction as op_dedup_minhash_capped
      SELECT band_idx, band_val, count(*) AS n,
             min(doc_id) AS rep, arg_min(sig, doc_id) AS rep_sig
      FROM bands GROUP BY band_idx, band_val
    ), bb AS (
      SELECT bands.doc_id, bands.sig, bands.band_idx, bands.band_val,
             sizes.n, sizes.rep, sizes.rep_sig
      FROM bands JOIN sizes USING (band_idx, band_val)
    ), near_dups AS (  -- the larger doc_id of each verified pair is dropped
      SELECT DISTINCT doc_b AS doc_id FROM (
        SELECT b.doc_id AS doc_b, a.sig AS sa, b.sig AS sb
        FROM bb a JOIN bb b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
        WHERE a.n <= {_LSH_BUCKET_CAP}
        UNION
        SELECT doc_id, rep_sig, sig FROM bb
        WHERE n > {_LSH_BUCKET_CAP} AND doc_id <> rep
      ) WHERE {DUCK.sig_match_frac('sa', 'sb')} >= 0.5
    )
    SELECT doc_id, lang, source, n_chars FROM survivors2
    WHERE doc_id NOT IN (SELECT doc_id FROM near_dups)""",
    doc="the end-to-end training-corpus cleaner, composing the kernels: "
    "quality gate -> exact dedup (hash groupBy + semi join) -> MinHash-LSH "
    "near-dedup (keep the smaller doc_id of each candidate pair), with the "
    "hot-bucket star cap from op_dedup_minhash_capped so a viral duplicate "
    "cannot blow the pair expansion quadratic. Every stage is the same "
    "operator exposed individually; one declarative plan, shuffles only on "
    "norm-hash and band buckets",
)
def op_corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    score = (
        F.lit(0.4) * F.least(F.size(toks).cast("double") / F.lit(50.0), F.lit(1.0))
        + F.lit(0.3) * (F.size(F.array_distinct(toks)).cast("double") / F.size(toks))
        + F.lit(0.3)
        * (
            F.size(F.expr("regexp_extract_all(lower(text), '[a-z]', 0)")).cast("double")
            / F.length("text")
        )
    )
    s1 = docs.filter(score >= 0.6)

    norm = F.regexp_replace(F.lower("text"), r"[ \t\n\x0b\f\r]+", " ")
    keep_exact = (
        s1.select("doc_id", norm.alias("__norm"))
        .groupBy("__norm")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s2 = s1.join(keep_exact, "doc_id", "semi")
    # NB: measured at sf0.1 — materializing s2 here REGRESSES this
    # composition (the upstream chain is cheap enough that the checkpoint
    # round-trip costs more than the recompute).  The capped pair generator
    # materializes its own annotated bands exactly once.

    near_dups = (
        minhash_capped_pairs(s2)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return s2.join(near_dups, "doc_id", "anti").select(
        "doc_id", "lang", "source", "n_chars"
    )


# ---------------------------------------------------------------------------
# more training-pipeline primitives: chunking, vocab, sampling, scrubbing,
# sliding windows
# ---------------------------------------------------------------------------

_CHUNK = 32  # tokens per chunk
_STRIDE = 24  # overlap = _CHUNK - _STRIDE = 8 tokens


@register(
    "op_text_chunk",
    f"""WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks,
             len(string_split(lower(text), ' ')) AS n FROM documents
    )
    SELECT doc_id, k - 1 AS chunk_id,
           len(toks[(k-1)*{_STRIDE}+1 : (k-1)*{_STRIDE}+{_CHUNK}]) AS n_chunk_tokens,
           array_to_string(toks[(k-1)*{_STRIDE}+1 : (k-1)*{_STRIDE}+{_CHUNK}], ' ')
             AS chunk_text
    FROM t CROSS JOIN (SELECT unnest(generate_series(1, 100)) AS k) u
    WHERE (k-1)*{_STRIDE} + 1 <= n AND (k = 1 OR (k-1)*{_STRIDE} + 1 <= n)
      AND k <= 1 + CAST(floor((greatest(n - {_CHUNK}, 0) + {_STRIDE} - 1)
                              / {_STRIDE}) AS BIGINT)""",
    doc="document chunking for training pipelines: 32-token chunks with "
    "8-token overlap (stride 24); pure array arithmetic, one generator per "
    "doc — no shuffle, chunk count bounded by token count",
)
def op_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.split(F.lower("text"), " ").alias("toks"),
        F.size(F.split(F.lower("text"), " ")).alias("n"),
    )
    # chunk count = 1 + ceil(max(n-32,0)/24) >= 1, so the sequence is never
    # empty/descending and needs no guard
    return (
        t.select("doc_id", "toks", F.explode(F.expr(
            f"sequence(1, 1 + CAST(floor((greatest(n - {_CHUNK}, 0)"
            f" + {_STRIDE - 1}) / {_STRIDE}) AS INT))"
        )).alias("k"))
        .select(
            "doc_id",
            (F.col("k") - 1).alias("chunk_id"),
            F.size(F.slice("toks", (F.col("k") - 1) * _STRIDE + 1, _CHUNK)).alias(
                "n_chunk_tokens"
            ),
            F.array_join(
                F.slice("toks", (F.col("k") - 1) * _STRIDE + 1, _CHUNK), " "
            ).alias("chunk_text"),
        )
    )


@register(
    "op_text_vocab",
    """WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ), agg AS (
      SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df FROM tok
      GROUP BY token
    )
    SELECT token, tf, df,
           CAST(row_number() OVER (ORDER BY tf DESC, token ASC) AS BIGINT) AS rnk
    FROM agg""",
    doc="corpus vocabulary with term and document frequencies + frequency "
    "rank — the TF-IDF precursor (idf itself needs ln(), which is not "
    "bit-portable across libm builds, so weights are left to the caller); "
    "explode + two-phase aggregate, one shuffle on token.  The frequency "
    "rank is the distributed two-level row_number (operators/ranks.py), "
    "not a single-partition window: a noisy 100 TB corpus has a 1e8-1e9 "
    "token vocabulary, far too large for one sort task",
)
def op_text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from daq_3i_spark.operators.ranks import global_row_number

    docs = load_spread(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    agg = tok.groupBy("token").agg(
        F.count("*").alias("tf"), F.countDistinct("doc_id").alias("df")
    )
    return global_row_number(
        agg, [F.col("tf").desc(), F.col("token").asc()], "rnk"
    )


_SAMPLE_PCT = 30  # keep ~30% per stratum


@register(
    "op_sample_stratified",
    f"""SELECT doc_id, lang, source FROM documents
    WHERE ({DUCK.char_hash('text')}) % 100 < {_SAMPLE_PCT}""",
    doc="deterministic stratified sampling: keep a doc iff its portable "
    "content hash mod 100 < 30 — reproducible across runs/engines/cluster "
    "sizes (unlike rand()-based sampling), stratification implicit in the "
    "content hash; pure filter, no shuffle",
)
def op_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    return docs.filter(
        (F.expr(SPARK.char_hash("text")) % 100) < _SAMPLE_PCT
    ).select("doc_id", "lang", "source")


# PII scrub patterns — restricted to constructs with IDENTICAL semantics in
# Java regex (Spark) and RE2 (DuckDB): explicit ASCII classes, bounded
# repetition, no \s / \b / backreferences / lookaround.  Applied in order:
# emails first (their local parts contain digits), then structured ids
# (SSN-shaped), then phones, then bare long digit runs, then residual digits.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
_PII_SSN = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
_PII_PHONE = "[+][0-9]{7,15}|[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
_PII_LONGID = "[0-9]{6,}"

# The synthetic corpus carries no digits at all, so the scrub kernel is
# exercised against deterministic PII trailers derived from doc_id — both
# engines build the identical string from the identical columns (same
# fixture-in-query pattern as op_multimodal_decode's PPM framing).
_PII_TRAILER_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com or +1555' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' ssn ' || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0')"
    " || '-' || lpad(CAST(doc_id % 90 + 10 AS VARCHAR), 2, '0')"
    " || '-' || lpad(CAST(doc_id % 9000 + 1000 AS VARCHAR), 4, '0')"
    " || ' ref ' || lpad(CAST((doc_id * 7919) % 1000000000 AS VARCHAR), 9, '0')"
)


@register(
    "op_text_scrub",
    f"""WITH t0 AS (
      SELECT doc_id, {_PII_TRAILER_SQL} AS pii_text FROM documents
    ), t1 AS (
      SELECT doc_id,
             len(regexp_extract_all(pii_text, '{_PII_EMAIL}')) AS n_emails,
             regexp_replace(pii_text, '{_PII_EMAIL}', '<EMAIL>', 'g') AS s
      FROM t0
    ), t2 AS (
      SELECT doc_id, n_emails,
             len(regexp_extract_all(s, '{_PII_SSN}')) AS n_ssn,
             regexp_replace(s, '{_PII_SSN}', '<ID>', 'g') AS s
      FROM t1
    ), t3 AS (
      SELECT doc_id, n_emails, n_ssn,
             len(regexp_extract_all(s, '{_PII_PHONE}')) AS n_phones,
             regexp_replace(s, '{_PII_PHONE}', '<PHONE>', 'g') AS s
      FROM t2
    ), t4 AS (
      SELECT doc_id, n_emails, n_ssn, n_phones,
             len(regexp_extract_all(s, '{_PII_LONGID}')) AS n_ids,
             regexp_replace(s, '{_PII_LONGID}', '<ID>', 'g') AS s
      FROM t3
    )
    SELECT doc_id, n_emails, n_ssn, n_phones, n_ids,
           len(regexp_extract_all(s, '[0-9]')) AS n_digits,
           md5(regexp_replace(s, '[0-9]', '#', 'g')) AS scrubbed_md5
    FROM t4""",
    doc="multi-pattern PII scrubbing (the training-data redaction pass): "
    "emails -> <EMAIL>, SSN-shaped ids -> <ID>, intl/US phones -> <PHONE>, "
    "bare 6+-digit runs -> <ID>, residual digits -> '#', applied in that "
    "order with per-pattern redaction counts and a final content digest.  "
    "Patterns restricted to constructs identical in Java regex and RE2; "
    "shuffle-free codegen projection (one regexp chain per row, no UDF)",
)
def op_text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    trailer = _PII_TRAILER_SQL.replace("AS VARCHAR", "AS STRING")
    df = docs.withColumn("s", F.expr(trailer))
    out_cols = []
    for cnt, pat, repl in [
        ("n_emails", _PII_EMAIL, "<EMAIL>"),
        ("n_ssn", _PII_SSN, "<ID>"),
        ("n_phones", _PII_PHONE, "<PHONE>"),
        ("n_ids", _PII_LONGID, "<ID>"),
    ]:
        df = df.withColumn(
            cnt, F.size(F.expr(f"regexp_extract_all(s, '{pat}', 0)"))
        ).withColumn("s", F.regexp_replace("s", pat, repl))
        out_cols.append(cnt)
    return df.select(
        "doc_id",
        *out_cols,
        F.size(F.expr("regexp_extract_all(s, '[0-9]', 0)")).alias("n_digits"),
        F.md5(F.expr("encode(regexp_replace(s, '[0-9]', '#'), 'utf-8')")).alias(
            "scrubbed_md5"
        ),
    )


@register(
    "op_window_sliding",
    """WITH w AS (
      SELECT time_bucket(INTERVAL '1 minute', ts) - k * INTERVAL '1 minute'
               AS window_start,
             event_type, value
      FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) u
    )
    SELECT CAST(window_start AS TIMESTAMP) AS window_start,
           CAST(window_start + INTERVAL '2 minutes' AS TIMESTAMP) AS window_end,
           event_type, count(*) AS n_events,
           (CAST(CAST(SUM(CAST(FLOOR((value) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e6) AS sum_value
    FROM w GROUP BY 1, 2, 3""",
    doc="sliding event-time windows (2-minute width, 1-minute slide): each "
    "event lands in exactly 2 windows; Spark's F.window handles the "
    "replication natively, the oracle enumerates the covering starts",
)
def op_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "2 minutes", "1 minute").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            fx_sum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "op_embed_quantize",
    """WITH m AS (
      SELECT vec_id, label, embedding,
             list_max(list_transform(embedding, __x -> abs(CAST(__x AS DOUBLE))))
               AS amax
      FROM embeddings
    ), s AS (
      SELECT vec_id, label, embedding,
             CASE WHEN amax > CAST(0 AS DOUBLE)
                  THEN CAST(127 AS DOUBLE) / amax ELSE CAST(1 AS DOUBLE) END AS scale
      FROM m
    )
    SELECT vec_id, label, scale,
           array_to_string(list_transform(embedding,
             __x -> CAST(floor(CAST(__x AS DOUBLE) * scale + CAST(0.5 AS DOUBLE))
                         AS INTEGER)), ',') AS q
    FROM s""",
    doc="int8 embedding quantization (the 4x storage cut for 100 TB vector "
    "corpora): per-vector symmetric scale 127/max|x|, portable "
    "floor(x*scale + 0.5) rounding (round() itself has engine-dependent "
    "tie behavior); scale kept alongside for dequantization; the code "
    "vector is serialized to a comma-joined string (scalar output contract)",
)
def op_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_spread(spark, sf_dir, "embeddings")
    amax = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    with_scale = emb.withColumn("amax", amax).withColumn(
        "scale",
        F.when(F.col("amax") > 0.0, F.lit(127.0) / F.col("amax")).otherwise(F.lit(1.0)),
    )
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * F.col("scale") + F.lit(0.5)).cast("int"),
    )
    q_str = F.array_join(F.transform(q, lambda x: x.cast("string")), ",")
    return with_scale.select("vec_id", "label", "scale", q_str.alias("q"))


@register(
    "op_text_bigrams",
    """WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ), bg AS (
      SELECT toks[i] AS w1, toks[i+1] AS w2
      FROM t CROSS JOIN LATERAL unnest(generate_series(1, len(toks) - 1)) AS u(i)
    ), pair_counts AS (
      SELECT w1, w2, count(*) AS n FROM bg GROUP BY w1, w2
    ), head_counts AS (
      SELECT w1, CAST(SUM(n) AS BIGINT) AS n1 FROM pair_counts GROUP BY w1
    )
    SELECT p.w1, p.w2, p.n,
           CAST(p.n AS DOUBLE) / h.n1 AS cond_p
    FROM pair_counts p JOIN head_counts h USING (w1)
    WHERE p.n >= 5""",
    doc="bigram language-model counts: adjacent-token pairs with conditional "
    "probability P(w2|w1), support >= 5 — the n-gram LM statistic behind "
    "perplexity-style quality filters; explode + two hash aggregates, "
    "shuffles on (w1,w2) then w1",
)
def op_text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split(F.lower("text"), " ").alias("toks"))
    bg = t.select(
        F.posexplode(F.expr("slice(toks, 1, size(toks) - 1)")).alias("i0", "w1"),
        F.col("toks"),
    ).select("w1", F.expr("toks[i0 + 1]").alias("w2"))
    pair_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    head_counts = pair_counts.groupBy("w1").agg(F.sum("n").alias("n1"))
    return (
        pair_counts.join(head_counts, "w1")
        .select(
            "w1", "w2", "n",
            (F.col("n").cast("double") / F.col("n1")).alias("cond_p"),
        )
        .filter(F.col("n") >= 5)
    )


@register(
    "op_text_lm_score",
    """WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ), bg AS (
      SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
      FROM t CROSS JOIN LATERAL unnest(generate_series(1, len(toks) - 1)) AS u(i)
    ), pair_counts AS (
      SELECT w1, w2, count(*) AS n FROM bg GROUP BY w1, w2
    ), head_counts AS (
      SELECT w1, CAST(SUM(n) AS BIGINT) AS n1 FROM pair_counts GROUP BY w1
    ), lm AS (
      SELECT p.w1, p.w2, CAST(p.n AS DOUBLE) / h.n1 AS cond_p
      FROM pair_counts p JOIN head_counts h USING (w1)
      WHERE p.n >= 5
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(CAST(SUM(CAST(FLOOR(coalesce(lm.cond_p, 0) * 1e6 + 0.5)
                              AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e6
             / CAST(count(*) AS DOUBLE) AS lm_score
    FROM bg LEFT JOIN lm ON bg.w1 = lm.w1 AND bg.w2 = lm.w2
    GROUP BY doc_id""",
    doc="perplexity-style LM quality scoring (the CCNet filter shape): the "
    "corpus's own bigram LM (op_text_bigrams: P(w2|w1), support >= 5) is "
    "applied back to every document — lm_score is the mean conditional "
    "probability of the doc's bigrams, unseen/low-support bigrams scoring "
    "0, so boilerplate-heavy docs score high and token-soup scores near 0.  "
    "All arithmetic is rational (count ratios) + fixed-point summation, so "
    "the score is bit-identical cross-engine with no libm log.  Shuffles: "
    "LM aggregation on (w1,w2) then w1, score join on (w1,w2), final "
    "regroup on doc_id; at 100 TB the LM head would be df-capped and the "
    "hot-bigram tail broadcast (same stop-entry trick as the capped dedups)",
)
def op_text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split(F.lower("text"), " ").alias("toks"))
    bg = t.select(
        "doc_id",
        F.posexplode(F.expr("slice(toks, 1, size(toks) - 1)")).alias("i0", "w1"),
        F.col("toks"),
    ).select("doc_id", "w1", F.expr("toks[i0 + 1]").alias("w2"))
    pair_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    head_counts = pair_counts.groupBy("w1").agg(F.sum("n").alias("n1"))
    lm = (
        pair_counts.join(head_counts, "w1")
        .filter(F.col("n") >= 5)
        .select("w1", "w2", (F.col("n").cast("double") / F.col("n1")).alias("cond_p"))
    )
    p_fx = F.floor(F.coalesce(F.col("cond_p"), F.lit(0.0)) * F.lit(1e6) + F.lit(0.5))
    return (
        bg.join(lm, ["w1", "w2"], "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (
                F.sum(p_fx).cast("double") / F.lit(1e6)
                / F.count("*").cast("double")
            ).alias("lm_score"),
        )
    )


# --- gap-fill interpolation (hypertable time_bucket_gapfill analog) ----------

#: the interpolation grid: one full day, minute resolution.  Bounds are
#: literals so both engines generate the identical series; samples OUTSIDE
#: the day still serve as neighbors (the window spans full history).
_INTERP_DAY_START = "2024-01-10 00:00:00"
_INTERP_DAY_END = "2024-01-10 23:59:00"


def _interp_oracle(grid_start: str, grid_end: str) -> str:
    """The global-window interpolation oracle for a [grid_start, grid_end]
    minute grid — shared VERBATIM by op_timeseries_interpolate, its
    hot-key-safe bucketed twin, and the multi-day generalization: each
    bucketed plan must hash-match the same SQL, which is the proof that
    carry-stitched two-pass == one unbounded window."""
    return f"""WITH {dims_cte_sql()},
    g AS (
      SELECT c.channel_id,
             unnest(generate_series(TIMESTAMP '{grid_start}',
                                    TIMESTAMP '{grid_end}',
                                    INTERVAL 1 MINUTE)) AS ts
      FROM (SELECT DISTINCT channel_id FROM channel_data) c
    ),
    u AS (
      SELECT channel_id, ts, value AS v, 1 AS tag, id FROM channel_data
      UNION ALL SELECT channel_id, ts, NULL, 0, -1 FROM g
    ),
    w AS (
      SELECT channel_id, ts, tag,
             last_value(v IGNORE NULLS) OVER
               (PARTITION BY channel_id ORDER BY ts, tag, id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN tag = 1 THEN ts END IGNORE NULLS) OVER
               (PARTITION BY channel_id ORDER BY ts, tag, id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             first_value(v IGNORE NULLS) OVER
               (PARTITION BY channel_id ORDER BY ts, tag, id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN tag = 1 THEN ts END IGNORE NULLS) OVER
               (PARTITION BY channel_id ORDER BY ts, tag, id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM u
    )
    SELECT channel_id, epoch_us(ts) AS minute_us,
           pv + (nv - pv) * (CAST(epoch_us(ts) - epoch_us(pt) AS DOUBLE)
                             / CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE))
             AS interp_value
    FROM w WHERE tag = 0 AND pv IS NOT NULL AND nv IS NOT NULL"""


_INTERP_ORACLE = _interp_oracle(_INTERP_DAY_START, _INTERP_DAY_END)


@register(
    "op_timeseries_interpolate",
    _INTERP_ORACLE,
    doc="gap-fill linear interpolation (the hypertable time_bucket_gapfill + "
    "interpolate() analog a DAQ front-end charts from): a per-channel "
    "minute grid over one day, each grid instant valued by linear "
    "interpolation between its surrounding samples.  Neighbors come from "
    "ONE union + two framed windows (last/first IGNORE NULLS) — no self-"
    "join, no range join; the (ts, tag) tie-break makes a sample exactly on "
    "a grid instant its NEXT neighbor, so the ratio hits 1 and the grid "
    "point reproduces the sample value exactly; the unique sample id is the "
    "final tie-break so duplicate-ts samples order deterministically in "
    "both engines (grid rows use -1 — they can never tie with a sample, "
    "tag differs).  All arithmetic is BIGINT "
    "epoch differences and correctly-rounded double ops — bit-portable.  "
    "One shuffle on channel_id; grid edges without both neighbors are "
    "omitted, not extrapolated",
)
def op_timeseries_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    cd = channel_data_df(spark, sf_dir)
    grid = (
        cd.select("channel_id")
        .distinct()
        .select(
            "channel_id",
            F.explode(
                F.sequence(
                    F.lit(_INTERP_DAY_START).cast("timestamp"),
                    F.lit(_INTERP_DAY_END).cast("timestamp"),
                    F.expr("INTERVAL 1 MINUTE"),
                )
            ).alias("ts"),
        )
    )
    u = cd.select(
        "channel_id", "ts", F.col("value").alias("v"), F.lit(1).alias("tag"),
        F.col("id"),
    ).unionByName(
        grid.select(
            "channel_id", "ts", F.lit(None).cast("double").alias("v"),
            F.lit(0).alias("tag"), F.lit(-1).cast("long").alias("id"),
        )
    )
    w = Window.partitionBy("channel_id").orderBy("ts", "tag", "id")
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # the "next" neighbor as a BACKWARD frame over the reversed ordering:
    # rows preceding the current one under (ts DESC, tag DESC) are exactly
    # the rows following it under (ts ASC, tag ASC), and Spark evaluates
    # [UNBOUNDED PRECEDING, CURRENT ROW] ignore-nulls frames incrementally
    # while a [CURRENT ROW, UNBOUNDED FOLLOWING] frame rescans per row —
    # measured 10.1 s -> sub-second at sf0.1 for the same results
    w_rev = Window.partitionBy("channel_id").orderBy(
        F.desc("ts"), F.desc("tag"), F.desc("id")
    )
    rback = w_rev.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sample_ts = F.when(F.col("tag") == 1, F.col("ts"))
    ann = u.select(
        "channel_id",
        "ts",
        "tag",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(sample_ts, ignorenulls=True).over(back).alias("pt"),
        F.last("v", ignorenulls=True).over(rback).alias("nv"),
        F.last(sample_ts, ignorenulls=True).over(rback).alias("nt"),
    )
    ratio = (
        (F.unix_micros("ts") - F.unix_micros("pt")).cast("double")
        / (F.unix_micros("nt") - F.unix_micros("pt")).cast("double")
    )
    return (
        ann.filter(
            (F.col("tag") == 0) & F.col("pv").isNotNull() & F.col("nv").isNotNull()
        )
        .select(
            "channel_id",
            F.unix_micros("ts").alias("minute_us"),
            (F.col("pv") + (F.col("nv") - F.col("pv")) * ratio).alias(
                "interp_value"
            ),
        )
    )


def _locf_oracle(grid_start: str, grid_end: str) -> str:
    """The global-window LOCF oracle for a [grid_start, grid_end] minute
    grid — shared verbatim by op_timeseries_locf, its bucketed twin, and
    the multiday generalization."""
    return f"""WITH {dims_cte_sql()},
    g AS (
      SELECT c.channel_id,
             unnest(generate_series(TIMESTAMP '{grid_start}',
                                    TIMESTAMP '{grid_end}',
                                    INTERVAL 1 MINUTE)) AS ts
      FROM (SELECT DISTINCT channel_id FROM channel_data) c
    ),
    u AS (
      SELECT channel_id, ts, value AS v, 0 AS tag, id FROM channel_data
      UNION ALL SELECT channel_id, ts, NULL, 1, -1 FROM g
    ),
    w AS (
      SELECT channel_id, ts, tag,
             last_value(v IGNORE NULLS) OVER
               (PARTITION BY channel_id ORDER BY ts, tag, id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN tag = 0 THEN ts END IGNORE NULLS) OVER
               (PARTITION BY channel_id ORDER BY ts, tag, id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt
      FROM u
    )
    SELECT channel_id, epoch_us(ts) AS minute_us, pv AS locf_value,
           epoch_us(ts) - epoch_us(pt) AS staleness_us
    FROM w WHERE tag = 1 AND pv IS NOT NULL"""


_LOCF_ORACLE = _locf_oracle(_INTERP_DAY_START, _INTERP_DAY_END)


@register(
    "op_timeseries_locf",
    _LOCF_ORACLE,
    doc="last-observation-carried-forward gap fill (the locf() twin of "
    "op_timeseries_interpolate): each grid instant takes the most recent "
    "sample AT or before it — samples sort before grid rows at equal ts "
    "(opposite tie-break to the interpolation op, where a coincident sample "
    "is the NEXT neighbor), so an exactly-coincident sample yields "
    "staleness 0.  The emitted staleness_us column is the DAQ liveness "
    "signal (how stale is this channel's chart point); one union + one "
    "framed window, one shuffle on channel_id, no joins at all",
)
def op_timeseries_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    cd = channel_data_df(spark, sf_dir)
    grid = (
        cd.select("channel_id")
        .distinct()
        .select(
            "channel_id",
            F.explode(
                F.sequence(
                    F.lit(_INTERP_DAY_START).cast("timestamp"),
                    F.lit(_INTERP_DAY_END).cast("timestamp"),
                    F.expr("INTERVAL 1 MINUTE"),
                )
            ).alias("ts"),
        )
    )
    u = cd.select(
        "channel_id", "ts", F.col("value").alias("v"), F.lit(0).alias("tag"),
        F.col("id"),
    ).unionByName(
        grid.select(
            "channel_id", "ts", F.lit(None).cast("double").alias("v"),
            F.lit(1).alias("tag"), F.lit(-1).cast("long").alias("id"),
        )
    )
    w = Window.partitionBy("channel_id").orderBy("ts", "tag", "id")
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ann = u.select(
        "channel_id",
        "ts",
        "tag",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True)
        .over(back)
        .alias("pt"),
    )
    return ann.filter((F.col("tag") == 1) & F.col("pv").isNotNull()).select(
        "channel_id",
        F.unix_micros("ts").alias("minute_us"),
        F.col("pv").alias("locf_value"),
        (F.unix_micros("ts") - F.unix_micros("pt")).alias("staleness_us"),
    )


#: day bounds of the gap-fill grid, DERIVED from _INTERP_DAY_START so the
#: bucketed plans can never stitch carries for a different day than the
#: (shared, verbatim) oracle queries over.
import datetime as _dt

_GAPFILL_DAY = _dt.datetime.fromisoformat(_INTERP_DAY_START).date()
_GAPFILL_DAY_LO = f"{_GAPFILL_DAY} 00:00:00"
_GAPFILL_DAY_HI = f"{_GAPFILL_DAY + _dt.timedelta(days=1)} 00:00:00"


def _gapfill_day_frames(spark: SparkSession, sf_dir: str):
    """(local, grid, before, after): the day-g sample slice, the minute grid,
    and the out-of-day history halves the carry aggregates reduce."""
    cd = channel_data_df(spark, sf_dir)
    g_lo = F.lit(_GAPFILL_DAY_LO).cast("timestamp")
    g_hi = F.lit(_GAPFILL_DAY_HI).cast("timestamp")
    grid = (
        cd.select("channel_id")
        .distinct()
        .select(
            "channel_id",
            F.explode(
                F.sequence(
                    F.lit(_INTERP_DAY_START).cast("timestamp"),
                    F.lit(_INTERP_DAY_END).cast("timestamp"),
                    F.expr("INTERVAL 1 MINUTE"),
                )
            ).alias("ts"),
        )
    )
    local = cd.filter((F.col("ts") >= g_lo) & (F.col("ts") < g_hi))
    before = cd.filter(F.col("ts") < g_lo)
    after = cd.filter(F.col("ts") >= g_hi)
    return local, grid, before, after


@register(
    "op_timeseries_interpolate_bucketed",
    _INTERP_ORACLE,  # IDENTICAL oracle to the global-window op — the proof
    # that carry-stitched two-pass == one unbounded window, bit for bit
    doc="hot-key-safe variant of op_timeseries_interpolate: instead of one "
    "unbounded per-channel window over FULL history (a single task per "
    "channel — fine at DAQ channel cardinality, a straggler if one key holds "
    "years of data), the plan is two-pass: (1) out-of-day history collapses "
    "map-side to one carry row per channel per side (max/min (ts,id,value) "
    "struct aggregates — partial aggregation means no task ever holds a "
    "channel's history), (2) the bounded day-g slice (1440 grid rows + that "
    "day's samples per channel) gets the framed neighbor windows, and "
    "boundary grid rows coalesce their missing neighbor from the broadcast "
    "carries.  Same output, same oracle, task size bounded by ONE "
    "channel-day regardless of total history — the shape that survives a "
    "hyper-hot key at 100 TB.  Generalizing to a multi-day grid replaces "
    "the two aggregates with a per-(channel, day) first/last rollup plus a "
    "days-ordered cumulative window over that tiny rollup",
)
def op_timeseries_interpolate_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    local, grid, before, after = _gapfill_day_frames(spark, sf_dir)
    # value and timestamp carries are SEPARATE aggregates, mirroring the
    # oracle's independent IGNORE-NULLS windows: pv skips NULL-valued
    # samples while pt advances on ANY sample, so a NULL-valued sample in
    # carry history must contribute its ts but not its value (a single
    # max(struct(ts,id,value)) would pick the NULL value and diverge)
    nn = F.when(F.col("value").isNotNull(), F.struct("ts", "id", "value"))
    carry_in = before.groupBy("channel_id").agg(
        F.max(nn).alias("ci_v"),
        F.max(F.struct("ts", "id")).alias("ci_t"),
    )
    carry_out = after.groupBy("channel_id").agg(
        F.min(nn).alias("co_v"),
        F.min(F.struct("ts", "id")).alias("co_t"),
    )
    u = local.select(
        "channel_id", "ts", F.col("value").alias("v"), F.lit(1).alias("tag"),
        F.col("id"),
    ).unionByName(
        grid.select(
            "channel_id", "ts", F.lit(None).cast("double").alias("v"),
            F.lit(0).alias("tag"), F.lit(-1).cast("long").alias("id"),
        )
    )
    w = Window.partitionBy("channel_id").orderBy("ts", "tag", "id")
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_rev = Window.partitionBy("channel_id").orderBy(
        F.desc("ts"), F.desc("tag"), F.desc("id")
    )
    rback = w_rev.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sample_ts = F.when(F.col("tag") == 1, F.col("ts"))
    ann = u.select(
        "channel_id",
        "ts",
        "tag",
        F.last("v", ignorenulls=True).over(back).alias("pv_l"),
        F.last(sample_ts, ignorenulls=True).over(back).alias("pt_l"),
        F.last("v", ignorenulls=True).over(rback).alias("nv_l"),
        F.last(sample_ts, ignorenulls=True).over(rback).alias("nt_l"),
    )
    st = (
        ann.join(F.broadcast(carry_in), "channel_id", "left")
        .join(F.broadcast(carry_out), "channel_id", "left")
        .select(
            "channel_id",
            "ts",
            "tag",
            F.coalesce("pv_l", F.col("ci_v.value")).alias("pv"),
            F.coalesce("pt_l", F.col("ci_t.ts")).alias("pt"),
            F.coalesce("nv_l", F.col("co_v.value")).alias("nv"),
            F.coalesce("nt_l", F.col("co_t.ts")).alias("nt"),
        )
    )
    ratio = (
        (F.unix_micros("ts") - F.unix_micros("pt")).cast("double")
        / (F.unix_micros("nt") - F.unix_micros("pt")).cast("double")
    )
    return (
        st.filter(
            (F.col("tag") == 0) & F.col("pv").isNotNull() & F.col("nv").isNotNull()
        )
        .select(
            "channel_id",
            F.unix_micros("ts").alias("minute_us"),
            (F.col("pv") + (F.col("nv") - F.col("pv")) * ratio).alias(
                "interp_value"
            ),
        )
    )


@register(
    "op_timeseries_locf_bucketed",
    _LOCF_ORACLE,  # identical oracle to the global-window LOCF op
    doc="hot-key-safe variant of op_timeseries_locf (see "
    "op_timeseries_interpolate_bucketed for the two-pass shape): pre-day "
    "history collapses to one carry row per channel, the framed window runs "
    "over the bounded day-g slice only, and start-of-day grid rows coalesce "
    "the carried (ts, value).  Same output and oracle; task size bounded by "
    "one channel-day",
)
def op_timeseries_locf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    local, grid, before, _after = _gapfill_day_frames(spark, sf_dir)
    # separate value/ts carries — see op_timeseries_interpolate_bucketed
    nn = F.when(F.col("value").isNotNull(), F.struct("ts", "id", "value"))
    carry_in = before.groupBy("channel_id").agg(
        F.max(nn).alias("ci_v"),
        F.max(F.struct("ts", "id")).alias("ci_t"),
    )
    u = local.select(
        "channel_id", "ts", F.col("value").alias("v"), F.lit(0).alias("tag"),
        F.col("id"),
    ).unionByName(
        grid.select(
            "channel_id", "ts", F.lit(None).cast("double").alias("v"),
            F.lit(1).alias("tag"), F.lit(-1).cast("long").alias("id"),
        )
    )
    w = Window.partitionBy("channel_id").orderBy("ts", "tag", "id")
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ann = u.select(
        "channel_id",
        "ts",
        "tag",
        F.last("v", ignorenulls=True).over(back).alias("pv_l"),
        F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True)
        .over(back)
        .alias("pt_l"),
    )
    st = ann.join(F.broadcast(carry_in), "channel_id", "left").select(
        "channel_id",
        "ts",
        "tag",
        F.coalesce("pv_l", F.col("ci_v.value")).alias("pv"),
        F.coalesce("pt_l", F.col("ci_t.ts")).alias("pt"),
    )
    return st.filter((F.col("tag") == 1) & F.col("pv").isNotNull()).select(
        "channel_id",
        F.unix_micros("ts").alias("minute_us"),
        F.col("pv").alias("locf_value"),
        (F.unix_micros("ts") - F.unix_micros("pt")).alias("staleness_us"),
    )


#: the multi-day grid (3 days, minute resolution) for the generalized
#: bucketed gap fill — carries here come from a per-(channel, day) rollup
#: plus cumulative windows over it, not single aggregates.
_MULTIDAY_DAYS = 3
_MULTIDAY_START = _GAPFILL_DAY_LO  # same first day as the one-day ops
_MULTIDAY_END = f"{_GAPFILL_DAY + _dt.timedelta(days=_MULTIDAY_DAYS - 1)} 23:59:00"
_MULTIDAY_HI_EXCL = f"{_GAPFILL_DAY + _dt.timedelta(days=_MULTIDAY_DAYS)} 00:00:00"


@register(
    "op_timeseries_interpolate_multiday",
    _interp_oracle(_MULTIDAY_START, _MULTIDAY_END),  # the same global-window
    # oracle shape as the one-day ops, over a 3-day grid
    doc="the GENERAL multi-day form of the hot-key-safe gap fill (the "
    "mechanism op_timeseries_interpolate_bucketed's docstring promises): "
    "buckets are (channel, DAY), and the cross-bucket carries come from a "
    "per-(channel, day) first/last-sample rollup (tiny: channels x days "
    "rows) with two cumulative windows over it — max(last_struct) over "
    "preceding days, min(first_struct) over following days.  Each bucket's "
    "framed neighbor windows run over one channel-day of rows; boundary "
    "grid rows coalesce the carried neighbor.  Hash-matches the global-"
    "window oracle over the full 3-day grid — two-pass carry-stitch == one "
    "unbounded window, at any grid length.  At 100 TB the rollup is a "
    "map-side partial aggregate and the carry windows run over a frame "
    "thousands of times smaller than the data",
)
def op_timeseries_interpolate_multiday(spark: SparkSession, sf_dir: str) -> DataFrame:
    cd = channel_data_df(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts"))
    grid = (
        cd.select("channel_id")
        .distinct()
        .select(
            "channel_id",
            F.explode(
                F.sequence(
                    F.lit(_MULTIDAY_START).cast("timestamp"),
                    F.lit(_MULTIDAY_END).cast("timestamp"),
                    F.expr("INTERVAL 1 MINUTE"),
                )
            ).alias("ts"),
        )
    )
    # per-(channel, day) sample rollup over FULL history — the only thing
    # out-of-grid history ever feeds (map-side combinable, never windowed).
    # Value and timestamp roll up SEPARATELY, mirroring the oracle's
    # independent IGNORE-NULLS windows (see op_timeseries_interpolate_
    # bucketed): a NULL-valued sample advances the neighbor ts but never
    # supplies a value.
    nn = F.when(F.col("value").isNotNull(), F.struct("ts", "id", "value"))
    roll = cd.groupBy("channel_id", day.alias("day")).agg(
        F.max(nn).alias("last_v"),
        F.max(F.struct("ts", "id")).alias("last_t"),
        F.min(nn).alias("first_v"),
        F.min(F.struct("ts", "id")).alias("first_t"),
    )
    grid_days = grid.select(
        "channel_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    frame = roll.join(grid_days, ["channel_id", "day"], "full_outer")
    w_days = Window.partitionBy("channel_id").orderBy("day")
    prev = w_days.rowsBetween(Window.unboundedPreceding, -1)
    nxt = w_days.rowsBetween(1, Window.unboundedFollowing)
    carries = frame.select(
        "channel_id",
        "day",
        F.max("last_v").over(prev).alias("ci_v"),
        F.max("last_t").over(prev).alias("ci_t"),
        F.min("first_v").over(nxt).alias("co_v"),
        F.min("first_t").over(nxt).alias("co_t"),
    )

    local = cd.filter(
        (F.col("ts") >= F.lit(_MULTIDAY_START).cast("timestamp"))
        & (F.col("ts") < F.lit(_MULTIDAY_HI_EXCL).cast("timestamp"))
    )
    u = local.select(
        "channel_id", "ts", F.col("value").alias("v"), F.lit(1).alias("tag"),
        F.col("id"),
    ).unionByName(
        grid.select(
            "channel_id", "ts", F.lit(None).cast("double").alias("v"),
            F.lit(0).alias("tag"), F.lit(-1).cast("long").alias("id"),
        )
    ).withColumn("day", F.date_trunc("day", F.col("ts")))
    w = Window.partitionBy("channel_id", "day").orderBy("ts", "tag", "id")
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_rev = Window.partitionBy("channel_id", "day").orderBy(
        F.desc("ts"), F.desc("tag"), F.desc("id")
    )
    rback = w_rev.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sample_ts = F.when(F.col("tag") == 1, F.col("ts"))
    ann = u.select(
        "channel_id",
        "day",
        "ts",
        "tag",
        F.last("v", ignorenulls=True).over(back).alias("pv_l"),
        F.last(sample_ts, ignorenulls=True).over(back).alias("pt_l"),
        F.last("v", ignorenulls=True).over(rback).alias("nv_l"),
        F.last(sample_ts, ignorenulls=True).over(rback).alias("nt_l"),
    )
    st = ann.join(F.broadcast(carries), ["channel_id", "day"]).select(
        "channel_id",
        "ts",
        "tag",
        F.coalesce("pv_l", F.col("ci_v.value")).alias("pv"),
        F.coalesce("pt_l", F.col("ci_t.ts")).alias("pt"),
        F.coalesce("nv_l", F.col("co_v.value")).alias("nv"),
        F.coalesce("nt_l", F.col("co_t.ts")).alias("nt"),
    )
    ratio = (
        (F.unix_micros("ts") - F.unix_micros("pt")).cast("double")
        / (F.unix_micros("nt") - F.unix_micros("pt")).cast("double")
    )
    return (
        st.filter(
            (F.col("tag") == 0) & F.col("pv").isNotNull() & F.col("nv").isNotNull()
        )
        .select(
            "channel_id",
            F.unix_micros("ts").alias("minute_us"),
            (F.col("pv") + (F.col("nv") - F.col("pv")) * ratio).alias(
                "interp_value"
            ),
        )
    )


@register(
    "op_timeseries_locf_multiday",
    _locf_oracle(_MULTIDAY_START, _MULTIDAY_END),
    doc="the multi-day form of the hot-key-safe LOCF (completing the "
    "gap-fill matrix: plain/bucketed/multiday x interpolate/LOCF): "
    "(channel, day) buckets, carry-in from the per-(channel, day) "
    "last-sample rollup via one cumulative preceding-days window — value "
    "and timestamp rolled up separately per the IGNORE-NULLS convention.  "
    "Hash-matches the global-window LOCF oracle over the 3-day grid",
)
def op_timeseries_locf_multiday(spark: SparkSession, sf_dir: str) -> DataFrame:
    cd = channel_data_df(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts"))
    grid = (
        cd.select("channel_id")
        .distinct()
        .select(
            "channel_id",
            F.explode(
                F.sequence(
                    F.lit(_MULTIDAY_START).cast("timestamp"),
                    F.lit(_MULTIDAY_END).cast("timestamp"),
                    F.expr("INTERVAL 1 MINUTE"),
                )
            ).alias("ts"),
        )
    )
    nn = F.when(F.col("value").isNotNull(), F.struct("ts", "id", "value"))
    roll = cd.groupBy("channel_id", day.alias("day")).agg(
        F.max(nn).alias("last_v"),
        F.max(F.struct("ts", "id")).alias("last_t"),
    )
    grid_days = grid.select(
        "channel_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    frame = roll.join(grid_days, ["channel_id", "day"], "full_outer")
    w_days = Window.partitionBy("channel_id").orderBy("day")
    prev = w_days.rowsBetween(Window.unboundedPreceding, -1)
    carries = frame.select(
        "channel_id",
        "day",
        F.max("last_v").over(prev).alias("ci_v"),
        F.max("last_t").over(prev).alias("ci_t"),
    )

    local = cd.filter(
        (F.col("ts") >= F.lit(_MULTIDAY_START).cast("timestamp"))
        & (F.col("ts") < F.lit(_MULTIDAY_HI_EXCL).cast("timestamp"))
    )
    u = local.select(
        "channel_id", "ts", F.col("value").alias("v"), F.lit(0).alias("tag"),
        F.col("id"),
    ).unionByName(
        grid.select(
            "channel_id", "ts", F.lit(None).cast("double").alias("v"),
            F.lit(1).alias("tag"), F.lit(-1).cast("long").alias("id"),
        )
    ).withColumn("day", F.date_trunc("day", F.col("ts")))
    w = Window.partitionBy("channel_id", "day").orderBy("ts", "tag", "id")
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ann = u.select(
        "channel_id",
        "day",
        "ts",
        "tag",
        F.last("v", ignorenulls=True).over(back).alias("pv_l"),
        F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True)
        .over(back)
        .alias("pt_l"),
    )
    st = ann.join(F.broadcast(carries), ["channel_id", "day"]).select(
        "channel_id",
        "ts",
        "tag",
        F.coalesce("pv_l", F.col("ci_v.value")).alias("pv"),
        F.coalesce("pt_l", F.col("ci_t.ts")).alias("pt"),
    )
    return st.filter((F.col("tag") == 1) & F.col("pv").isNotNull()).select(
        "channel_id",
        F.unix_micros("ts").alias("minute_us"),
        F.col("pv").alias("locf_value"),
        (F.unix_micros("ts") - F.unix_micros("pt")).alias("staleness_us"),
    )


@register(
    "op_events_funnel",
    """WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click'
        AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL '24 hours'
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL '24 hours'
      GROUP BY e.user_id
    )
    SELECT 'view' AS step, (SELECT CAST(count(*) AS BIGINT) FROM v) AS users
    UNION ALL SELECT 'click', (SELECT CAST(count(*) AS BIGINT) FROM c)
    UNION ALL SELECT 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM p)""",
    doc="conversion-funnel analysis over the event stream: users who "
    "viewed, then clicked within 24h of their FIRST view, then purchased "
    "within 24h of that first qualifying click — the classic product-"
    "analytics sequential pattern (each step anchors on the previous "
    "step's min event time, so the count is deterministic, not "
    "any-pair).  Plan: three min-aggregates chained on user_id — the "
    "SAME shuffle key throughout, so the stages co-partition and no "
    "step re-shuffles the event scan differently; step outputs are "
    "user-cardinality rows joined back to the (pruned by event_type) "
    "scan.  At 100 TB the funnel is a fixed number of co-partitioned "
    "passes, never a per-user collect or a cross join of step events",
)
def op_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    win = F.expr("INTERVAL 24 HOURS")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def step(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").cast("bigint").alias("users")).select(
            F.lit(name).alias("step"), "users"
        )

    return step("view", v).unionByName(step("click", c)).unionByName(
        step("purchase", p)
    )


@register(
    "op_events_cohort_retention",
    """WITH s AS (
      SELECT user_id, time_bucket(INTERVAL '7 days', min(ts),
                                  TIMESTAMP '2024-01-01') AS cohort_w
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), a AS (
      SELECT DISTINCT e.user_id,
             time_bucket(INTERVAL '7 days', e.ts,
                         TIMESTAMP '2024-01-01') AS active_w
      FROM events e
    )
    SELECT epoch_us(s.cohort_w) AS cohort_week_us,
           CAST((epoch_us(a.active_w) - epoch_us(s.cohort_w))
                / CAST(604800000000 AS BIGINT) AS BIGINT) AS week_offset,
           CAST(count(DISTINCT s.user_id) AS BIGINT) AS users
    FROM s JOIN a ON s.user_id = a.user_id AND a.active_w >= s.cohort_w
    GROUP BY 1, 2""",
    doc="weekly cohort-retention matrix — the second product-analytics "
    "staple beside the funnel: users cohorted by their signup week "
    "(7-day buckets anchored at 2024-01-01, identical bucketing in both "
    "engines), crossed with the distinct weeks they were active at ALL "
    "(any event type), emitting (cohort week, week offset, users).  "
    "Plan: one min-aggregate for cohorts + one distinct-projection for "
    "activity, joined on user_id and re-aggregated on the tiny (cohort, "
    "offset) key — the activity side never materializes per-event rows "
    "past the distinct.  Week bounds leave as epoch-micros BIGINT "
    "(timestamp-canonicalization-neutral, same convention as "
    "op_window_agg_events)",
)
def op_events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    # window() anchors at the epoch; 2024-01-01 is 19723 days after it and
    # 19723 mod 7 = 4, so a 4-day startTime shifts the 7-day grid onto the
    # oracle's time_bucket origin of 2024-01-01 exactly
    wk = lambda c: F.window(c, "7 days", startTime="4 days").getField("start")  # noqa: E731
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
        .select("user_id", wk(F.col("t0")).alias("cohort_w"))
    )
    a = ev.select("user_id", wk(F.col("ts")).alias("active_w")).distinct()
    return (
        s.join(a, "user_id")
        .filter(F.col("active_w") >= F.col("cohort_w"))
        .groupBy("cohort_w", "active_w")
        .agg(F.countDistinct("user_id").cast("bigint").alias("users"))
        .select(
            F.unix_micros("cohort_w").alias("cohort_week_us"),
            (
                (F.unix_micros("active_w") - F.unix_micros("cohort_w"))
                / F.lit(7 * 86400 * 1_000_000)
            )
            .cast("bigint")
            .alias("week_offset"),
            "users",
        )
    )


# ---------------------------------------------------------------------------
# code-vs-prose detection (corpus routing for code-aware pipelines)
# ---------------------------------------------------------------------------

#: code-density gate in per-mille: is_code when signal chars exceed
#: _CODE_DENSITY_PM per 1000 characters (integer cross-multiplication)
_CODE_DENSITY_PM = 5


def _occ_sql(pat: str, n: int) -> str:
    """Occurrences of a literal in ``text`` via the replace-count identity
    (replace is all-occurrences in both engines; no regex dialect risk)."""
    lit = pat.replace("'", "''")
    return f"(length(text) - length(replace(text, '{lit}', ''))) // {n}"


@register(
    "op_text_code_detect",
    f"""WITH f AS (
      SELECT doc_id, length(text) AS n_chars,
             {_occ_sql('{', 1)} + {_occ_sql('}', 1)} AS n_braces,
             {_occ_sql(';', 1)} AS n_semicolons,
             {_occ_sql(chr(10) + '    ', 5)} AS n_indents,
             {_occ_sql('==', 2)} AS n_eqeq
      FROM documents
    )
    SELECT doc_id, n_chars,
           CAST(n_braces AS BIGINT) AS n_braces,
           CAST(n_semicolons AS BIGINT) AS n_semicolons,
           CAST(n_indents AS BIGINT) AS n_indents,
           CAST(n_eqeq AS BIGINT) AS n_eqeq,
           CAST(n_braces + n_semicolons + n_indents + n_eqeq AS DOUBLE)
             / CAST(n_chars AS DOUBLE) AS code_density,
           (n_braces + n_semicolons + n_indents + n_eqeq) * 1000
             >= n_chars * {_CODE_DENSITY_PM} AS is_code
    FROM f WHERE n_chars > 0""",
    doc="code-vs-prose routing signal: per-document counts of the four "
    "strongest code markers (braces, semicolons, 4-space-indented line "
    "starts, '==') via the replace-count identity — counting by "
    "length(text) − length(replace(text, marker, '')) uses only "
    "all-occurrence literal replace, so there is NO regex dialect to "
    "reconcile between engines (the PII-scrub lesson).  is_code fires "
    "when signal chars ≥ 5 per mille of the document, decided by "
    "integer cross-multiplication; code_density is the one "
    "correctly-rounded division.  A code-aware training pipeline "
    "routes is_code docs to code-specific cleaning/tokenization "
    "(the quality heuristics for prose — stopword ratios, sentence "
    "shape — actively misjudge source code).  Plan: pure per-row "
    "codegen projection over the scan, NO shuffle, NO join — the "
    "cheapest possible operator shape at any corpus size",
)
def op_text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")

    def occ(pat: str) -> F.Column:
        return (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit(pat))))
            / F.lit(len(pat))
        ).cast("long")

    f = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        (occ("{") + occ("}")).alias("n_braces"),
        occ(";").alias("n_semicolons"),
        occ("\n    ").alias("n_indents"),
        occ("==").alias("n_eqeq"),
    )
    signal = (
        F.col("n_braces")
        + F.col("n_semicolons")
        + F.col("n_indents")
        + F.col("n_eqeq")
    )
    return f.filter(F.col("n_chars") > 0).select(
        "doc_id",
        "n_chars",
        F.col("n_braces").cast("bigint").alias("n_braces"),
        F.col("n_semicolons").cast("bigint").alias("n_semicolons"),
        F.col("n_indents").cast("bigint").alias("n_indents"),
        F.col("n_eqeq").cast("bigint").alias("n_eqeq"),
        (signal.cast("double") / F.col("n_chars").cast("double")).alias(
            "code_density"
        ),
        (signal * 1000 >= F.col("n_chars") * _CODE_DENSITY_PM).alias("is_code"),
    )
