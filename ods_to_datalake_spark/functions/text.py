"""Text-analysis expression library (charter LLM-pipeline extensions).

Everything here is pure Catalyst expressions (split / transform / filter /
aggregate higher-order functions + md5) — no UDFs, so the hot path stays
JVM-side and vectorized, and every operator has an exactly-matching ANSI-SQL
oracle (DuckDB computes identical md5 hex, so even MinHash is cross-engine
reproducible).

Scale notes: all operators are per-row (map-only, no shuffle) except where
documented. Shingle/minhash arrays are bounded by token count; for 100-TB
corpora the per-row cost is linear and embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Modulus for fingerprint arithmetic: 2^31-1 (Mersenne prime).
FP_MOD = 2_147_483_647
# Modulus for the MinHash Carter-Wegman family: 2^61-1 (Mersenne prime).
# Operands stay within int64: a,b < 16^14 ≈ 7.2e16, a + 7b < 5.8e17.
MINHASH_PRIME = (1 << 61) - 1
# Knuth multiplicative constant for positional weights.
FP_WEIGHT = 2_654_435_761

# Small deterministic stopword lists for the language-ID heuristic.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "in", "that"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "que"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "que"),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of lowercased, trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def shingles(tok: Column, n: int) -> Column:
    """Word n-gram shingles: overlapping windows of `n` tokens joined by
    a single space. Empty array when the document has < n tokens.

    Built as a zip_with chain against shifted slices of the token
    array, NOT transform(sequence, i -> array_join(slice(tok, i, n))):
    the slice form allocates a sub-array per element inside an
    interpreted lambda and measured 9× slower at n=2 / 6× at n=3 (the
    same interpreted-HOF trap as minhash_table's 20× — see CLAUDE.md).
    zip_with pads the shorter shifted side with nulls; concat
    propagates them, so the trailing n-1 positions null out and one
    cheap filter drops them — values identical to the slice form
    (property-tested).
    """
    if n <= 1:
        return tok
    acc = tok
    for i in range(1, n):
        shifted = F.slice(
            tok, i + 1, F.greatest(F.size(tok) - i, F.lit(1))
        )
        acc = F.zip_with(
            acc, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.filter(acc, lambda x: x.isNotNull())


def simhash32(tok: Column) -> Column:
    """32-bit SimHash as a 32-char bitstring.

    Per-token projection: bit i of token t = MSB of the i-th hex nibble of
    md5(t) (each nibble's top bit is an independent balanced bit of a
    strong hash). Document bit i = sign of sum over tokens of ±1.
    Pure expressions; identical in ANSI SQL.
    """
    hashes = F.transform(tok, F.md5)  # one md5 per token

    def nibble_signs(h: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.lit(32)),
            lambda i: F.when(
                F.substring(h, i, 1).isin(
                    "8", "9", "a", "b", "c", "d", "e", "f"
                ),
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )

    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 32),
        lambda acc, h: F.zip_with(acc, nibble_signs(h), lambda a, b: a + b),
    )
    bits = F.transform(
        counts, lambda c: F.when(c > 0, F.lit("1")).otherwise(F.lit("0"))
    )
    return F.array_join(bits, "")


def hex_word_value(word: Column, hex_chars: int = 6) -> Column:
    """Deterministic integer value of a word: first `hex_chars` hex chars
    of md5 as a bigint (< 16^hex_chars). Shared with the SQL oracle via
    `CAST(concat('0x', substring(md5(w),1,n)) AS BIGINT)`."""
    return F.conv(F.substring(F.md5(word), 1, hex_chars), 16, 10).cast("long")


def fingerprint(tok: Column) -> Column:
    """Order-sensitive document fingerprint.

    Positional weighted hash: sum_i value(token_i) * weight(i) mod 2^31-1,
    with weight(i) = (i * FP_WEIGHT) mod (2^31-1). Order-sensitive (unlike
    a bag-of-words hash) yet expressible as a plain sum in ANSI SQL — no
    sequential fold needed, so it parallelizes and has an exact oracle.

    Overflow discipline: each term is reduced mod 2^31-1 BEFORE the sum
    (term < 2^31, so the long accumulator holds ~2^32 tokens); summing
    raw products would overflow int64 past ~260 tokens. The SQL oracle
    may sum raw terms (hugeint) — sums of residues are congruent mod
    the prime, so results agree.
    """
    weighted = F.transform(
        tok,
        lambda t, i: hex_word_value(t)
        * ((i + 1).cast("long") * F.lit(FP_WEIGHT) % F.lit(FP_MOD))
        % F.lit(FP_MOD),
    )
    return F.aggregate(
        weighted, F.lit(0).cast("long"), lambda acc, x: acc + x
    ) % F.lit(FP_MOD)


def stopword_count(tok: Column, words: tuple[str, ...]) -> Column:
    """Number of tokens that are in the given stopword list."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tok, lambda t: F.array_contains(arr, t)))


def langid_scores(tok: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratio (0..1)."""
    n = F.greatest(F.size(tok), F.lit(1))
    return {
        lang: stopword_count(tok, words) / n
        for lang, words in STOPWORDS.items()
    }


def langid(tok: Column) -> Column:
    """Argmax language with deterministic tie-break (list order), 'und'
    when no stopword hits at all."""
    scores = langid_scores(tok)
    langs = list(scores)
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.when(best <= 0, F.lit("und"))
    for lang in langs:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr


# Gopher quality-rule constants (Rae et al. 2021, appendix A1.1).
# Thresholds are expressed as integer ratios (num/den) so every rule is
# a pure integer comparison — no division, no float literals, no ANSI
# divide-by-zero guard needed (see CLAUDE.md's boundary rules).
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MEAN_LEN_MIN = 3  # mean word length lower bound (chars)
GOPHER_MEAN_LEN_MAX = 10
GOPHER_SYMBOL_NUM, GOPHER_SYMBOL_DEN = 1, 10  # symbols/words <= 0.1
GOPHER_ALPHA_NUM, GOPHER_ALPHA_DEN = 4, 5  # alpha words/words >= 0.8
GOPHER_BULLET_NUM, GOPHER_BULLET_DEN = 9, 10  # non-bullet lines >= 0.9
GOPHER_ELLIPSIS_NUM, GOPHER_ELLIPSIS_DEN = 3, 10  # ellipsis lines <= 0.3
GOPHER_MIN_STOPWORDS = 2


def gopher_stats(text_col: Column | str) -> dict[str, Column]:
    """Per-document Gopher quality-rule inputs (Rae et al. 2021 A1.1):
    word count, total word chars, alphabetic-word count, distinct
    Gopher-stopword hits, symbol count (# and ellipsis), line counts
    (bullet-start / ellipsis-end). All counts are BIGINT, all built-in
    JVM expressions; NULL text yields NULL counts (same three-valued
    logic DuckDB applies, so the `passes` CASE lands 0 in both).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    tok = tokens(c)
    lines = F.split(c, r"\r?\n")
    n_chars = F.length(c)
    ell3 = F.floor(
        (n_chars - F.length(F.replace(c, F.lit("..."), F.lit("")))) / 3
    )
    n_symbols = (
        (n_chars - F.length(F.replace(c, F.lit("#"), F.lit(""))))
        + ell3
        + (n_chars - F.length(F.replace(c, F.lit("…"), F.lit(""))))
    )
    # distinct stopwords present: 8 explicit contains-terms, identical
    # shape to the oracle's CASE sum (array_intersect dedup semantics
    # are NOT identical across engines, so neither side uses them)
    n_stop = sum(
        F.when(F.array_contains(tok, w), F.lit(1)).otherwise(F.lit(0))
        for w in GOPHER_STOPWORDS
    )
    return {
        "n_words": F.size(tok).cast("long"),
        "word_chars": F.aggregate(
            F.transform(tok, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
        "n_alpha_words": F.size(
            F.filter(tok, lambda t: t.rlike("[a-z]"))
        ).cast("long"),
        "n_stop": n_stop.cast("long"),
        "n_symbols": n_symbols.cast("long"),
        "n_lines": F.size(lines).cast("long"),
        "n_bullet_lines": F.size(
            F.filter(lines, lambda ln: F.ltrim(ln).rlike("^[-*•]"))
        ).cast("long"),
        "n_ellipsis_lines": F.size(
            F.filter(
                lines, lambda ln: F.rtrim(ln).rlike(r"(\.\.\.|…)$")
            )
        ).cast("long"),
    }


def gopher_passes(s: dict[str, Column]) -> Column:
    """0/1 conjunction of the Gopher rules over `gopher_stats` output.
    Pure integer-scaled comparisons; NULL inputs (NULL text) fall to
    the ELSE branch → 0, matching the oracle's CASE."""
    ok = (
        (s["n_words"] >= GOPHER_MIN_WORDS)
        & (s["n_words"] <= GOPHER_MAX_WORDS)
        & (GOPHER_MEAN_LEN_MIN * s["n_words"] <= s["word_chars"])
        & (s["word_chars"] <= GOPHER_MEAN_LEN_MAX * s["n_words"])
        & (
            GOPHER_SYMBOL_DEN * s["n_symbols"]
            <= GOPHER_SYMBOL_NUM * s["n_words"]
        )
        & (
            GOPHER_ALPHA_DEN * s["n_alpha_words"]
            >= GOPHER_ALPHA_NUM * s["n_words"]
        )
        & (s["n_stop"] >= GOPHER_MIN_STOPWORDS)
        & (
            GOPHER_BULLET_DEN * (s["n_lines"] - s["n_bullet_lines"])
            >= GOPHER_BULLET_NUM * s["n_lines"]
        )
        & (
            GOPHER_ELLIPSIS_DEN * s["n_ellipsis_lines"]
            <= GOPHER_ELLIPSIS_NUM * s["n_lines"]
        )
    )
    return F.when(ok, F.lit(1)).otherwise(F.lit(0)).cast("long")


# C4 cleaning-rule constants (Raffel et al. 2020 §2.2). The published
# pipeline also applies the LDNOOBW blocklist; that list plugs into
# `c4_stats(blocklist=...)` — the default carries only the two
# content markers named in the paper itself.
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3
C4_DOC_BLOCKLIST: tuple[str, ...] = ("lorem ipsum", "{")
C4_LINE_BLOCKWORD = "javascript"


def c4_keep_line(ln: Column) -> Column:
    """C4's line filter: ends in terminal punctuation (. ! ? \"), has
    at least C4_MIN_LINE_WORDS whitespace words, and does not mention
    the line blockword (case-insensitive)."""
    return (
        F.rtrim(ln).rlike('[.!?"]$')
        & (
            F.size(F.split(F.trim(ln), r"\s+"))
            >= F.lit(C4_MIN_LINE_WORDS)
        )
        & ~F.contains(F.lower(ln), F.lit(C4_LINE_BLOCKWORD))
    )


def c4_stats(
    text_col: Column | str,
    blocklist: tuple[str, ...] = C4_DOC_BLOCKLIST,
) -> dict[str, Column]:
    """Per-document C4 cleaning (Raffel et al. 2020): filter lines by
    `c4_keep_line`, rebuild the cleaned text, and evaluate the
    doc-level gates (blocklist hit, >= C4_MIN_SENTENCES sentences in
    the cleaned text). All built-in JVM expressions, zero shuffles;
    NULL text propagates NULL stats and a 0 keep flag — same
    three-valued logic as the SQL oracle."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    lines = F.split(c, r"\r?\n")
    kept = F.filter(lines, c4_keep_line)
    cleaned = F.array_join(kept, "\n")
    n_sentences = F.size(
        F.regexp_extract_all(cleaned, F.lit("[.!?]"), 0)
    ).cast("long")
    blocked = None
    for w in blocklist:
        hit = F.contains(F.lower(c), F.lit(w))
        blocked = hit if blocked is None else (blocked | hit)
    keep = (
        ~blocked
        & (n_sentences >= F.lit(C4_MIN_SENTENCES))
        & (F.size(kept) >= F.lit(1))
    )
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_kept_lines": F.size(kept).cast("long"),
        "n_sentences": n_sentences,
        "blocked": F.when(blocked, F.lit(1)).otherwise(F.lit(0)).cast(
            "long"
        ),
        "cleaned_text": cleaned,
        "keep": F.when(keep, F.lit(1)).otherwise(F.lit(0)).cast("long"),
    }
