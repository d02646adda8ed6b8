"""Text-analysis expressions for large-scale document pipelines
(SURVEY §2.11 north-star: token counting, quality scoring, language-ID
heuristic, document fingerprinting).

Everything here is a Column expression over native functions — JVM-side,
codegen-friendly, no Python boundary — so a 100 TB documents table runs
these at scan speed. Regex patterns are RE2/Java-compatible ASCII classes
so DuckDB oracles can mirror them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Whitespace word split and a BPE-ish token pattern (word runs or single
# non-space punctuation), identical semantics in Java regex and RE2.
WORD_SPLIT_RE = r"\s+"
BPE_TOKEN_RE = r"\w+|[^\w\s]"
PUNCT_CLASS_RE = r"[.,;:!?'\"()\[\]{}-]"

# Tiny per-language stopword markers for the heuristic language-ID.
# Deliberately small and ASCII: the point is the *operator shape*
# (per-language evidence counts → argmax), not linguistic accuracy.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "is", "of", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
}


def words(text: Column) -> Column:
    """Whitespace tokenization: split on runs of whitespace and drop
    empty tokens. The empty-token filter (not trim+guard) is what makes
    all-whitespace inputs — including tabs/newlines, which ``trim``
    does NOT strip — yield an empty array (found by hypothesis:
    token_count('\\n') was 2 with the trim-guard formulation).
    """
    return F.filter(F.split(text, WORD_SPLIT_RE), lambda w: w != "")


def token_count(text: Column) -> Column:
    """Whitespace token count (reference-free; north-star token counting)."""
    return F.size(words(text))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: word runs + individual punctuation marks."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def punct_count(text: Column) -> Column:
    """Number of punctuation characters (explicit ASCII class)."""
    return F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS_RE, ""))


_SLICE_ALL = 1 << 30  # slice length "to the end" (slice tolerates overrun)


def ngrams_from_words(w: Column, n: int) -> Column:
    """Word n-grams from a token-array column via a zip_with chain of
    shifted copies — the reference-safe idiom for Spark's optimizer.

    WHY NOT sequence+transform+slice: Catalyst freely inlines a
    referenced expression into lambda bodies (CollapseProject /
    ColumnPruning), and subexpression elimination skips lambda and
    conditional contexts — so ``slice(w, i, n)`` per element re-derives
    ``w`` per shingle: O(words²) per row. Here each shifted copy
    references ``w`` exactly once at row level and the lambdas touch
    only their element arguments, so the plan stays O(n·words) per row
    no matter how the optimizer rewrites it.

    zip_with pads the shorter (shifted) arrays with NULLs; concat
    propagates NULL, and the final filter drops those tail entries —
    which also makes texts with fewer than ``n`` words yield an empty
    array with no conditional guard at all.
    """
    acc = w
    for k in range(1, n):
        shifted = F.slice(w, k + 1, _SLICE_ALL)
        acc = F.zip_with(acc, shifted, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.filter(acc, lambda x: x.isNotNull())


def word_ngrams(text: Column, n: int) -> Column:
    """Array of word n-grams (shingles) joined by single spaces;
    texts with fewer than ``n`` words yield an empty array.
    """
    return ngrams_from_words(words(text), n)


def with_word_ngrams(
    df: DataFrame, text_col: str, n: int, out_col: str = "grams", distinct: bool = False
) -> DataFrame:
    """Append a word-``n``-gram shingle column (optionally de-duplicated).

    Tokenization is staged as its own projection: the n-gram zip chain
    references the token array ``n`` times, and CollapseProject keeps a
    non-cheap expression referenced more than once in its own Project —
    so ``split`` runs once per row instead of once per shifted copy.
    """
    tmp = f"__{out_col}_words"
    grams = ngrams_from_words(F.col(tmp), n)
    if distinct:
        grams = F.array_distinct(grams)
    return (
        df.withColumn(tmp, words(F.col(text_col)))
        .withColumn(out_col, grams)
        .drop(tmp)
    )


def with_token_chunks(
    df: DataFrame,
    text_col: str,
    chunk_tokens: int,
    stride: int,
    out_col: str = "chunk",
) -> DataFrame:
    """Explode each document into sliding token-window chunks (RAG /
    context-window prep): chunk ``i`` covers tokens
    ``[i·stride, i·stride + chunk_tokens)``; the last chunk may be
    short; empty texts yield no chunks. Adds ``{out}_idx``,
    ``{out}_text`` and ``{out}_n_tokens`` columns, one output row per
    chunk.

    The token array is staged as its own projection (an attribute), so
    the per-chunk ``slice`` references it without re-deriving it — total
    per-row cost is O(chunks · chunk_tokens), all codegen expressions.
    Output grows ~(1/stride) rows per token: chunking SHUFFLES nothing
    by itself — it is a flatMap the scan absorbs.
    """
    tmp = f"__{out_col}_words"
    n_words = F.size(F.col(tmp))
    idxs = F.sequence(
        F.lit(0), F.floor((n_words - 1) / stride).cast("int"), F.lit(1)
    )
    staged = (
        df.withColumn(tmp, words(F.col(text_col)))
        .filter(n_words > 0)
        .withColumn(f"{out_col}_idx", F.explode(idxs))
    )
    piece = F.slice(
        F.col(tmp), F.col(f"{out_col}_idx") * stride + 1, chunk_tokens
    )
    return (
        staged.withColumn(f"{out_col}_text", F.array_join(piece, " "))
        .withColumn(f"{out_col}_n_tokens", F.size(piece).cast("long"))
        .drop(tmp)
    )


def fingerprint(text: Column, n: int = 5) -> Column:
    """Rolling-hash document fingerprint: lexicographic min of the MD5s
    of the word-``n``-gram shingles (a 1-permutation MinHash / winnowing
    style sketch). Short documents fall back to MD5 of the trimmed text.

    MD5 (not xxhash64) so heterogeneous engines agree on the digest.
    """
    grams = word_ngrams(text, n)
    return F.when(
        F.size(grams) > 0, F.array_min(F.transform(grams, F.md5))
    ).otherwise(F.md5(F.trim(text)))


def hashed_linear_logit(text: Column, salt: str = "qcls") -> Column:
    """Feature-hashed linear classifier logit over whitespace tokens —
    the fastText-style shape production quality classifiers run at
    corpus scale: every token hashes into a weight, the document's
    logit is the sum. Weights here are DERIVED from the hash itself
    (no trained artifact ships with the engine): w(tok) =
    base28(md5(salt:lower(tok))) % 2001 − 1000 ∈ [−1000, 1000] milli-
    units, so the logit is an order-free BIGINT sum — bit-exact on any
    engine (the portable-hash discipline of ``fingerprint``/MinHash,
    applied to model scoring). Swapping in learned weights means
    replacing the hash-derived lookup with a broadcast weight-table
    join — the plan shape (one narrow map, no shuffle) is unchanged.
    """
    token_w = F.transform(
        words(text),
        lambda t: F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + ":"), F.lower(t))), 1, 7), 16, 10
        ).cast("long")
        % 2001
        - 1000,
    )
    return F.aggregate(token_w, F.lit(0).cast("long"), lambda acc, x: acc + x)


def lang_marker_hits(text: Column, markers: list[str]) -> Column:
    """How many tokens of ``text`` are in the marker list (case-insensitive)."""
    lowered = F.transform(words(text), F.lower)
    marker_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.array_intersect(F.array_distinct(lowered), marker_arr))


def _predicted_lang_from_hits(hits: dict[str, Column]) -> Column:
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # Reverse order so earlier languages win ties (last write wins below).
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def predicted_lang(text: Column) -> Column:
    """Heuristic language-ID: argmax of per-language marker hits with a
    fixed language-order tiebreak; no hits at all → 'und' (undetermined).

    Single-expression form re-tokenizes per language — fine for small
    data; hot paths use ``with_predicted_lang`` (tokenizes once).
    """
    hits = {lang: lang_marker_hits(text, m) for lang, m in LANG_MARKERS.items()}
    return _predicted_lang_from_hits(hits)


def with_predicted_lang(df: DataFrame, text_col: str, out_col: str = "predicted_lang") -> DataFrame:
    """Language-ID with the token set staged once (reference-once
    discipline — the 4 per-language hit counts read an attribute instead
    of re-splitting the text 4×)."""
    tmp = f"__{out_col}_lw"
    staged = df.withColumn(
        tmp, F.array_distinct(F.transform(words(F.col(text_col)), F.lower))
    )
    hits = {
        lang: F.size(F.array_intersect(F.col(tmp), F.array(*[F.lit(m) for m in marks])))
        for lang, marks in LANG_MARKERS.items()
    }
    return staged.withColumn(out_col, _predicted_lang_from_hits(hits)).drop(tmp)


def quality_score(text: Column) -> Column:
    """Composite document-quality score in [0, 1]:
    0.4·length-score + 0.3·punctuation-score + 0.3·stopword-score.

    Mirrors the heuristics production LLM-data pipelines use (length,
    punctuation density, stopword density) with every term expressible
    in portable SQL. Operand order is fixed so double arithmetic is
    bit-identical across engines.
    """
    n_tok = token_count(text).cast("double")
    len_score = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    p_ratio = punct_count(text).cast("double") / F.greatest(
        F.length(text).cast("double"), F.lit(1.0)
    )
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - F.lit(5.0) * p_ratio)
    stop_hits = lang_marker_hits(text, LANG_MARKERS["en"]).cast("double")
    stop_score = F.least(F.lit(1.0), F.lit(4.0) * stop_hits / F.greatest(n_tok, F.lit(1.0)))
    return F.round(
        F.lit(0.4) * len_score + F.lit(0.3) * punct_score + F.lit(0.3) * stop_score, 4
    )


# -- PII scrubbing -----------------------------------------------------------

# conservative ASCII patterns that behave identically under Java regex
# (Spark) and RE2 (DuckDB) — no lookbehind, no backrefs
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
PHONE_RE = r"\+?[0-9][0-9()\[\] .-]{7,}[0-9]"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

PII_PATTERNS = {
    "email": EMAIL_RE,
    "url": URL_RE,
    "phone": PHONE_RE,
    "ipv4": IPV4_RE,
}


def scrub_pii(text: Column, kinds: tuple[str, ...] = ("email", "url", "ipv4", "phone")):
    """Redact PII spans with ``<KIND>`` placeholders — the standard
    pre-training scrub pass, as pure regexp_replace expressions so a
    100 TB corpus scrubs at scan speed inside codegen (no UDF).

    Returns (scrubbed_text, counts) where ``counts`` maps each kind to
    its match-count column — pipelines keep the counts as per-doc
    scrub metadata. Order matters: URLs and IPv4s before phones (a
    URL's digit run half-matches the phone pattern mid-redaction, and
    a dotted IPv4 of ≥9 chars — digits, dots both in the phone char
    class — would be eaten whole as a <PHONE>); the default tuple is
    already safely ordered.

    .. note:: The default order changed from ``(email, url, phone,
       ipv4)`` to ``(email, url, ipv4, phone)`` when the audit found
       IPv4s being eaten as ``<PHONE>``. Scrub metadata persisted under
       the old default can differ on IPv4-bearing text — re-scrub or
       pass the old tuple explicitly to reproduce it.

    Cross-engine identity of every pattern
    (Java regex vs DuckDB RE2) is graded by ``pii_scrub_audit``.
    """
    counts = {}
    scrubbed = text
    for kind in kinds:
        pattern = PII_PATTERNS[kind]
        counts[kind] = F.regexp_count(scrubbed, F.lit(pattern)).cast("long")
        scrubbed = F.regexp_replace(scrubbed, pattern, f"<{kind.upper()}>")
    return scrubbed, counts
