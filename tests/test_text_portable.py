"""The portable text kernels must produce bit-identical values in Spark and
DuckDB — that is the entire oracle-parity contract of the extension ops
(functions/text.py).  These tests compare the two dialect renderings of each
kernel directly on adversarial strings, independent of the registry plumbing.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from daq_3i_spark.functions.text import DUCK, SPARK, MINHASH_K

CASES = [
    "key agg row scan slow fast table value",
    "a",
    "",
    "the the the the",
    "x " * 40 + "y",
    "one two",  # below shingle width
    "hello world foo bar baz qux quux corge",
]


def _spark_vals(spark, expr: str) -> list:
    df = spark.createDataFrame([(t,) for t in CASES], "text string")
    return [r[0] for r in df.select(F.expr(expr).alias("v")).collect()]


def _duck_vals(expr: str) -> list:
    con = duckdb.connect()
    out = []
    for t in CASES:
        out.append(con.execute(f"SELECT {expr} FROM (SELECT ? AS text)", [t]).fetchone()[0])
    return out


@pytest.mark.parametrize(
    "kernel",
    ["char_hash", "token_hashes", "token_hashes64"],
)
def test_scalar_kernels_match(spark, kernel):
    s = getattr(SPARK, kernel)("text")
    d = getattr(DUCK, kernel)("text")
    assert _spark_vals(spark, s) == _duck_vals(d)


def test_simhash_match(spark):
    s = SPARK.simhash(SPARK.token_hashes("text"))
    d = DUCK.simhash(DUCK.token_hashes("text"))
    sv, dv = _spark_vals(spark, s), _duck_vals(d)
    assert sv == dv
    assert all(0 <= v < 2**32 for v in sv)


def test_simhash64_match(spark):
    """The op_dedup_simhash composition: 62-bit simhash over the two-word
    token hashes — bit-identical across engines, BIGINT-positive (bits
    62-63 never set), and genuinely exercising the upper word."""
    s = SPARK.simhash(SPARK.token_hashes64("text"))
    d = DUCK.simhash(DUCK.token_hashes64("text"))
    sv, dv = _spark_vals(spark, s), _duck_vals(d)
    assert sv == dv
    assert all(0 <= v < 2**62 for v in sv)
    assert any(v >= 2**31 for v in sv if v)  # the upper word carries bits


def test_shingle_and_minhash_match(spark):
    s_sh = SPARK.shingle_hashes(SPARK.token_hashes("text"))
    d_sh = DUCK.shingle_hashes(DUCK.token_hashes("text"))
    assert _spark_vals(spark, s_sh) == _duck_vals(d_sh)

    # minhash over docs with >= 1 shingle (array_min of empty is NULL-ish)
    s_sig = SPARK.minhash_sig(s_sh)
    d_sig = DUCK.minhash_sig(d_sh)
    sv = _spark_vals(spark, s_sig)
    dv = _duck_vals(d_sig)
    for a, b in zip(sv, dv):
        assert list(a) == list(b)
        assert len(a) == MINHASH_K


def test_band_hashes_match(spark):
    s = SPARK.band_hashes(SPARK.minhash_sig(SPARK.shingle_hashes(SPARK.token_hashes("text"))))
    d = DUCK.band_hashes(DUCK.minhash_sig(DUCK.shingle_hashes(DUCK.token_hashes("text"))))
    long_cases = [c for c in CASES if len(c.split()) >= 3]
    df_vals = _spark_vals(spark, s)
    duck_vals = _duck_vals(d)
    for t, a, b in zip(CASES, df_vals, duck_vals):
        if t in long_cases:
            assert list(a) == list(b), t


def test_hash_range(spark):
    vals = _spark_vals(spark, SPARK.char_hash("text"))
    assert all(v is not None and 0 <= v < 2_147_483_647 for v in vals)


# --- property: random (incl. unicode) strings, both dialects agree -----------

from hypothesis import given, settings, strategies as st  # noqa: E402

# the parity contract covers characters whose lower() agrees across engines
# (functions/text.py module doc).  Hypothesis surfaced two real boundaries:
#   - U+0130 'İ': Java/Python lowercase to 2 codepoints, DuckDB utf8proc to 1
#     (Unicode SPECIAL-CASING divergence)
#   - U+10570: lowercased by utf8proc (Unicode 14+) but not by JDK 17's older
#     Unicode tables (Unicode VERSION divergence)
# so the property pins parity over the stable Latin/IPA range + digits/punct,
# which still exercises multi-byte UTF-8 (é, ƙ, ʼn, ...).
_rand_text = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8",
            categories=("Lu", "Ll", "Nd", "Zs", "Po"),
            max_codepoint=0x2FF,
        ).filter(lambda c: len(c.lower()) == 1),
        max_size=40,
    ),
    min_size=3,
    max_size=3,
)


@settings(max_examples=12, deadline=None)
@given(texts=_rand_text)
def test_kernels_agree_on_random_unicode(spark, texts):
    import duckdb

    sdf = spark.createDataFrame([(t,) for t in texts], "text string")
    con = duckdb.connect()
    for s_expr, d_expr in [
        (SPARK.char_hash("text"), DUCK.char_hash("text")),
        (SPARK.token_hashes("text"), DUCK.token_hashes("text")),
        (SPARK.token_hashes64("text"), DUCK.token_hashes64("text")),
        (
            SPARK.simhash(SPARK.token_hashes64("text")),
            DUCK.simhash(DUCK.token_hashes64("text")),
        ),
    ]:
        sv = [r[0] for r in sdf.select(F.expr(s_expr).alias("v")).collect()]
        dv = [
            con.execute(f"SELECT {d_expr} FROM (SELECT ? AS text)", [t]).fetchone()[0]
            for t in texts
        ]
        sv = [list(v) if isinstance(v, (list, tuple)) else v for v in sv]
        dv = [list(v) if isinstance(v, (list, tuple)) else v for v in dv]
        assert sv == dv, f"dialect drift on {texts!r}"


def test_char_hash_null_contract(spark):
    """The r9 split-based Spark char_hash (linear; the substr-by-index form
    was O(len^2) per document) must keep the old NULL->0 contract and agree
    with DuckDB on a long document (the regime the rewrite targets)."""
    long_text = "lorem ipsum dolor sit amet " * 400  # ~10 KB
    df = spark.createDataFrame([(None,), (long_text,)], "text string")
    sv = [r[0] for r in df.select(
        F.expr(SPARK.char_hash("text")).alias("v")).collect()]
    assert sv[0] == 0  # NULL -> 0, as the aggregate-over-sequence form gave
    con = duckdb.connect()
    dv = con.execute(
        f"SELECT {DUCK.char_hash('text')} FROM (SELECT ? AS text)", [long_text]
    ).fetchone()[0]
    assert sv[1] == dv


# --- toy-BPE tokenizer ---------------------------------------------------------


def test_bpe_kernels_match(spark):
    s = SPARK.bpe_token_count("text")
    d = DUCK.bpe_token_count("text")
    assert _spark_vals(spark, s) == _duck_vals(d)


def _ref_bpe_pieces(word: str) -> list[str]:
    """Independent reference: rank-order full-pass BPE (per merge, ONE
    left-to-right symbol scan merging all adjacent occurrences) — the
    semantics the string-replace encoding must reproduce.  Kept as a plain
    Python loop so the engine kernels are checked against an implementation
    that shares none of their machinery."""
    from daq_3i_spark.functions.text import BPE_MERGES, BPE_SEP

    syms = list(word.replace(BPE_SEP, ""))
    for x, y in BPE_MERGES:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_merge_semantics(spark):
    """Pin the merge program itself: rank order, ALL adjacent occurrences
    per pass (the two-replace encoding — pass 2 catches occurrences whose
    leading separator pass 1 consumed: "banana"'s second a,n), separator
    stripping, and the chained merges ((t,h)->th feeding (th,e)->the;
    (i,n)->in feeding (in,g)->ing)."""
    import duckdb

    con = duckdb.connect()

    def pieces(word: str) -> str:
        q = word.replace("'", "''")
        return con.execute("SELECT " + DUCK.bpe_pieces(f"'{q}'")).fetchone()[0]

    assert pieces("the") == "·the·"          # t+h -> th, th+e -> the
    assert pieces("standing") == "·st·and·ing·"  # chained in->ing, an->and
    assert pieces("banana") == "·b·an·an·a·"  # back-to-back (a,n) both merge
    assert pieces("ananan") == "·an·an·an·"   # chains cascade in pass 2
    assert pieces("lll") == "·l·l·l·"        # no (l,l) merge in the table
    assert pieces("x·y") == "·x·y·"          # separator stripped from input
    assert pieces("") == "··"                # empty word = one piece

    # per-word counts follow from the encoded string without re-running the
    # merge chain: length identity
    cnt = con.execute("SELECT " + DUCK.bpe_word_count("'standing'")).fetchone()[0]
    assert cnt == 3


def test_bpe_matches_reference_implementation(spark):
    """Fuzz the engine kernel against the independent Python reference —
    cross-engine parity alone can't catch a systematic encoding bug shared
    by both dialect renderings; this can."""
    import random

    import duckdb

    con = duckdb.connect()
    rng = random.Random(7)
    alphabet = "thean iorsgd"
    for _ in range(400):
        w = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 14))
        ).replace(" ", "")
        q = w.replace("'", "''")
        got = con.execute("SELECT " + DUCK.bpe_pieces(f"'{q}'")).fetchone()[0]
        ref = _ref_bpe_pieces(w)
        want = "·" + "·".join(ref) + "·" if ref else "··"
        assert got == want, (w, got, want)


@settings(max_examples=8, deadline=None)
@given(texts=_rand_text)
def test_bpe_agrees_on_random_unicode(spark, texts):
    import duckdb

    sdf = spark.createDataFrame([(t,) for t in texts], "text string")
    con = duckdb.connect()
    sv = [
        r[0]
        for r in sdf.select(
            F.expr(SPARK.bpe_token_count("text")).alias("v")
        ).collect()
    ]
    dv = [
        con.execute(
            f"SELECT {DUCK.bpe_token_count('text')} FROM (SELECT ? AS text)", [t]
        ).fetchone()[0]
        for t in texts
    ]
    assert sv == dv, f"BPE dialect drift on {texts!r}"
