"""Portable text-analysis kernels: one expression tree, two dialects.

The extension operators (SURVEY.md §2.8; dedup / fingerprinting / language-ID
/ quality scoring) need hash functions that the DuckDB oracle can reproduce
*bit-for-bit*.  Engine-native hashes (xxhash64, murmur) differ between
engines, so every kernel here is built from portable arithmetic:

* rolling polynomial hash  ``h = (h*31 + codepoint) mod (2^31-1)`` — exact in
  int64 (no overflow: h < 2^31, h*31 + 0x10FFFF < 2^36);
* affine min-hash permutations ``(a*h + b) mod (2^31-1)`` with hardcoded
  (a, b) constants — products stay < 2^62;
* integer bit ops (xor / shift / bit_count) for SimHash, identical in both
  engines (verified in tests/test_text_portable.py).

Everything is generated through the :class:`Dialect` renderer so the Spark
plan (``F.expr``) and the DuckDB oracle SQL come from the *same* template —
parity by construction, not by careful transcription.

Parity contract: guaranteed for text where ``lower()`` agrees between the
engines — all of ASCII and the stable Latin/IPA ranges at minimum.  Two
engine-level divergences exist outside that (found by the hypothesis
property test, tests/test_text_portable.py): Unicode SPECIAL-CASING
expansions (U+0130 'İ' lowercases to 2 codepoints in Java/Python, 1 in
DuckDB's utf8proc) and Unicode VERSION skew (letters added after JDK 17's
Unicode tables lowercase in utf8proc but not the JVM).  These are lower()
implementation differences, not kernel differences.

Performance: these are pure Catalyst expression trees (whole-stage codegen,
no Python, no shuffle until the explicit groupBy/join of the operator using
them).  The per-character fold is a tight generated loop; at 100 TB the scan
stays I/O-bound.  Ref: the reference has no text ops at all — this implements
the BASELINE.json north-star extension surface.
"""

from __future__ import annotations

P = 2_147_483_647  # Mersenne prime 2^31 - 1: hash modulus
B = 31  # polynomial base
B2 = 37  # second, independent polynomial base — the upper word of the
#         62-bit token hash (token_hashes64); same modulus P

# 16 affine minhash permutations (a, b), a odd, generated once from a fixed
# seed and frozen here as constants (both engines must see identical values).
MINHASH_PERMS: list[tuple[int, int]] = [
    (1203114659, 1768045981), (653468061, 1483134390), (1817245907, 201465966),
    (588191817, 842465187), (1113647461, 1162858971), (543629347, 1057559365),
    (711559173, 820727717), (1823962449, 400181493), (1807121397, 1444349247),
    (906130983, 982156621), (624441669, 1931121521), (203552069, 562519897),
    (2116781963, 1632873051), (1730450349, 1837399063), (1468772189, 492371405),
    (1130427761, 752346099),
]
MINHASH_K = len(MINHASH_PERMS)
LSH_BANDS = 4  # 4 bands x 4 rows
LSH_ROWS = MINHASH_K // LSH_BANDS

# SimHash width: 62 meaningful bits (the 2^31-word pair of token_hashes64
# never sets bits 62-63), banded as 4 x 16-bit bands for the hamming<=3
# pigeonhole.  Was 32 bits / 4 x 8-bit bands through r13: 8-bit bands give
# only 256 buckets per band, so candidate pairs grow O(n^2/256) with corpus
# size — measured super-linear at the 50x probe (tools/probe_scale_curve.py,
# SCALE.md r14); 16-bit bands put bucket count at 65,536 per band, the same
# scheme op_multimodal_phash always used.
SIMHASH_BITS = 62

#: Frozen toy-BPE merge table, applied IN ORDER (rank order, like a published
#: tokenizer's merges.txt).  The pairs are the highest-frequency English
#: character merges every public BPE vocabulary learns first (the GPT-2
#: merges list opens with exactly this family); freezing them here keeps the
#: tokenizer deterministic and oracle-able — both engines replay the same
#: merge program, no training pass.  Later merges may consume earlier
#: outputs ((t,h) -> th feeds (th,e) -> the; (i,n) -> in feeds (in,g)).
BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"), ("an", "d"),
    ("o", "r"), ("e", "s"), ("i", "s"), ("o", "u"), ("a", "r"),
    ("in", "g"), ("s", "t"), ("o", "f"), ("i", "t"), ("a", "l"),
]

#: Symbol separator for the string-encoded piece sequence.  Stripped from
#: the input word first, so it can never collide with content; U+00B7 is a
#: single code point in both engines' length()/replace().
BPE_SEP = "·"


class Dialect:
    """Renders the portable expression templates for Spark SQL or DuckDB."""

    def __init__(self, spark: bool):
        self.is_spark = spark

    # --- array primitives ----------------------------------------------------

    def transform(self, arr: str, var: str, body: str) -> str:
        fn = "transform" if self.is_spark else "list_transform"
        return f"{fn}({arr}, {var} -> {body})"

    def filt(self, arr: str, var: str, body: str) -> str:
        fn = "filter" if self.is_spark else "list_filter"
        return f"{fn}({arr}, {var} -> {body})"

    def amin(self, arr: str) -> str:
        return f"array_min({arr})" if self.is_spark else f"list_min({arr})"

    def size(self, arr: str) -> str:
        return f"size({arr})" if self.is_spark else f"len({arr})"

    def at(self, arr: str, i: str) -> str:
        """1-based element access (i may be an expression)."""
        return f"element_at({arr}, {i})" if self.is_spark else f"{arr}[{i}]"

    def seq1n(self, n: str) -> str:
        """[1..n], empty when n <= 0 (Spark's sequence() would *descend*)."""
        if self.is_spark:
            return f"filter(sequence(1, greatest({n}, 1)), __i -> __i <= {n})"
        return f"generate_series(1, {n})"

    def fold_long(self, arr: str, init: str, acc: str, var: str, body: str) -> str:
        """Left fold with BIGINT accumulator; identical order both engines."""
        if self.is_spark:
            return f"aggregate({arr}, CAST({init} AS BIGINT), ({acc}, {var}) -> {body})"
        return (
            f"list_reduce(list_prepend(CAST({init} AS BIGINT), {arr}), "
            f"({acc}, {var}) -> {body})"
        )

    def fold_double(self, arr: str, init: str, acc: str, var: str, body: str) -> str:
        if self.is_spark:
            return f"aggregate({arr}, CAST({init} AS DOUBLE), ({acc}, {var}) -> {body})"
        return (
            f"list_reduce(list_prepend(CAST({init} AS DOUBLE), {arr}), "
            f"({acc}, {var}) -> {body})"
        )

    def arr(self, items: list[str]) -> str:
        joined = ", ".join(items)
        return f"array({joined})" if self.is_spark else f"[{joined}]"

    def split(self, s: str, sep: str = "' '") -> str:
        fn = "split" if self.is_spark else "string_split"
        return f"{fn}({s}, {sep})"

    def bitcount(self, x: str) -> str:
        return f"bit_count({x})"

    def bxor(self, a: str, b: str) -> str:
        return f"({a} ^ {b})" if self.is_spark else f"xor({a}, {b})"

    # --- text kernels --------------------------------------------------------

    def char_hash(self, s: str, base: int = B) -> str:
        """Rolling polynomial hash of a string's code points, in [0, P)."""
        if self.is_spark:
            # split-into-chars, NOT substr-by-index: substr(s, i, 1) seeks
            # the code-point boundary from the string start on every call,
            # making the sequence(1, length)/substr form O(len^2) per
            # document — caught by the r9 sf0.1->sf1 scaling sweep
            # (op_sample_stratified x17.4) and 3.3x slower even at sf0.1.
            # split('') is one linear pass; the empty boundary element it
            # emits is filtered, and coalesce keeps the sequence form's
            # NULL->0 contract.  Value-identical on every corpus text and
            # edge case (tests/test_text_portable.py pins it).
            codes = (
                f"transform(filter(split({s}, ''), __c -> __c <> ''), "
                f"__c -> CAST(ascii(__c) AS BIGINT))"
            )
            folded = self.fold_long(codes, "0", "__a", "__c",
                                    f"(__a*{base} + __c) % {P}")
            return f"coalesce({folded}, 0)"
        codes = self.transform(self.seq1n(f"length({s})"), "__ci",
                               f"CAST(ascii(substr({s}, __ci, 1)) AS BIGINT)")
        return self.fold_long(codes, "0", "__a", "__c", f"(__a*{base} + __c) % {P}")

    def tokens(self, text: str) -> str:
        """Whitespace tokens of the lowercased text."""
        return self.split(f"lower({text})")

    def token_hashes(self, text: str) -> str:
        """array<bigint>: rolling hash of each whitespace token."""
        return self.transform(self.tokens(text), "__t", self.char_hash("__t"))

    def token_hashes64(self, text: str) -> str:
        """array<bigint>: 62-bit token hashes — the base-{B} hash in the
        upper 31-bit word (shifted by 2^31), an independent base-{B2} hash
        in the lower.  Feeds the 62-bit simhash; both words < P < 2^31, so
        the combined value stays below 2^62 (BIGINT-safe, bits 62-63 never
        set)."""
        return self.transform(
            self.tokens(text),
            "__t",
            f"({self.char_hash('__t')}) * 2147483648"
            f" + ({self.char_hash('__t', base=B2)})",
        )

    def shingle_hashes(self, hs: str, n: int = 3) -> str:
        """Hashes of n-token shingles, combined from the token hashes.

        ``hs`` must be an expression for array<bigint> (token_hashes).
        Empty when the doc has < n tokens.
        """
        combine = self.at(hs, "__si")
        for j in range(1, n):
            combine = f"(({combine})*{B} + {self.at(hs, f'__si+{j}')}) % {P}"
        return self.transform(self.seq1n(f"{self.size(hs)} - {n - 1}"), "__si", combine)

    def minhash_sig(self, shingles: str) -> str:
        """array<bigint> of MINHASH_K signature slots over the shingle hashes."""
        slots = [
            self.amin(self.transform(shingles, "__h", f"({a}*__h + {b}) % {P}"))
            for a, b in MINHASH_PERMS
        ]
        return self.arr(slots)

    def band_hashes(self, sig: str) -> str:
        """array<bigint> of LSH_BANDS band buckets folded from the signature."""
        bands = []
        for b in range(LSH_BANDS):
            h = self.at(sig, str(b * LSH_ROWS + 1))
            for r in range(1, LSH_ROWS):
                h = f"(({h})*{B} + {self.at(sig, str(b * LSH_ROWS + r + 1))}) % {P}"
            bands.append(h)
        return self.arr(bands)

    def simhash(self, hs: str) -> str:
        """SIMHASH_BITS-bit SimHash over token hashes: bit i is set when more
        tokens have bit i set than clear."""
        bits = []
        for i in range(SIMHASH_BITS):
            vote = self.fold_long(
                hs, "0", "__a", "__h", f"__a + 2*(({'__h'} >> {i}) & 1) - 1"
            )
            bits.append(f"(CASE WHEN ({vote}) > 0 THEN CAST({1 << i} AS BIGINT) "
                        f"ELSE CAST(0 AS BIGINT) END)")
        out = bits[0]
        for b in bits[1:]:
            out = f"{out} + {b}"
        return f"({out})"

    def bpe_pieces(self, w: str) -> str:
        """BPE piece sequence of one word, encoded as a ``BPE_SEP``-joined
        string (``·h·e·l·l·o·`` -> merges -> ``·h·e·ll·o·``).

        The merge program runs as a chain of plain string ``replace`` calls.
        One merge pass = TWO replaces:

        1. ``·x·y·`` -> ``·xy·`` merges every occurrence whose leading
           separator is intact — but the match consumes the separator
           AFTER ``y``, so an occurrence immediately following a merged one
           (``x,y,x,y`` chains: "banana"'s second ``a,n``) is skipped;
        2. ``xy·x·y·`` -> ``xy·xy·`` catches exactly those skipped
           occurrences (each is, by construction, directly preceded by the
           just-merged ``xy·``), and its replacement re-ends with ``·`` so
           arbitrarily long ``xyxyxy...`` chains cascade within the one
           left-to-right scan.

        Together they merge ALL adjacent (x, y) symbol pairs — the true BPE
        merge-pass semantics for x != y (occurrences of a pair with x != y
        never share a symbol, so a real scan merges every one; BPE_MERGES
        contains no x == y pair, where greedy pairing would differ).  Rank
        order equals constituent-creation order in the table (as in any
        trained merges.txt), so in-order full passes match the min-rank
        tokenizer loop.  Pure codegen string ops — the same replace-count
        identity family as op_text_code_detect; no UDF, no per-character
        fold.
        """
        stripped = f"replace({w}, '{BPE_SEP}', '')"
        chars = self.filt(self.split(stripped, "''"), "__c", "__c <> ''")
        join = (
            f"array_join({chars}, '{BPE_SEP}')"
            if self.is_spark
            else f"array_to_string({chars}, '{BPE_SEP}')"
        )
        # DuckDB's array_to_string returns NULL on an empty list (Spark's
        # array_join returns '') — coalesce so an empty word is '··', one
        # piece, in BOTH engines
        s = f"'{BPE_SEP}' || coalesce({join}, '') || '{BPE_SEP}'"
        for x, y in BPE_MERGES:
            s = (
                f"replace({s}, '{BPE_SEP}{x}{BPE_SEP}{y}{BPE_SEP}', "
                f"'{BPE_SEP}{x}{y}{BPE_SEP}')"
            )
            s = (
                f"replace({s}, '{x}{y}{BPE_SEP}{x}{BPE_SEP}{y}{BPE_SEP}', "
                f"'{x}{y}{BPE_SEP}{x}{y}{BPE_SEP}')"
            )
        return s

    def bpe_word_count(self, w: str) -> str:
        """BIGINT: number of BPE pieces in one word.

        Counts separators without re-evaluating the merge chain: merges
        never change the non-separator content, so the piece count is
        ``length(pieces) - length(strip(w)) - 1`` — the encoded string is
        referenced ONCE (referencing it twice would double the codegen'd
        merge chain).
        """
        stripped = f"replace({w}, '{BPE_SEP}', '')"
        return (
            f"CAST(length({self.bpe_pieces(w)}) - length({stripped}) - 1 "
            f"AS BIGINT)"
        )

    def bpe_token_count(self, text: str) -> str:
        """BIGINT: total BPE tokens of the lowercased text (sum over
        whitespace words of :meth:`bpe_word_count`)."""
        counts = self.transform(self.tokens(text), "__w", self.bpe_word_count("__w"))
        return self.fold_long(counts, "0", "__a", "__x", "__a + __x")

    def sig_match_frac(self, sa: str, sb: str) -> str:
        """Fraction of equal slots between two signatures (minhash Jaccard
        estimate), as DOUBLE."""
        eq = self.transform(
            self.seq1n(str(MINHASH_K)),
            "__k",
            f"CASE WHEN {self.at(sa, '__k')} = {self.at(sb, '__k')} "
            f"THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END",
        )
        total = self.fold_long(eq, "0", "__a", "__x", "__a + __x")
        return f"CAST({total} AS DOUBLE) / {float(MINHASH_K)}"


SPARK = Dialect(spark=True)
DUCK = Dialect(spark=False)
