"""Distributed BPE tokenizer training (Sennrich et al. 2016, ACL).

The missing piece between "token counting" and an actual trained
tokenizer: byte-pair-encoding learns its merge table by repeatedly
(1) counting adjacent symbol pairs across the corpus weighted by word
frequency, and (2) merging the most frequent pair. At 100 TB step (1)
is the whole game — and it is exactly one map-side-combined groupBy
over the WORD-FREQUENCY table (vocab-sized, not corpus-sized), because
BPE statistics only ever depend on (word, count), never on documents.

Scale shape:

- ``word_frequencies`` is the only corpus-sized pass (explode + count;
  shuffle carries (word, partial) pairs bounded by vocabulary).
- Each merge iteration runs on the vocab table: explode adjacent
  pairs → groupBy(pair).sum(freq) → ONE driver row (the argmax), then
  an Arrow-batched merge application over the vocab. Per-iteration
  shuffle is O(Σ word-length · vocab), independent of corpus size.
- The merge loop is driver-coordinated like Lloyd/PageRank iterations:
  bounded rounds, one job each, `localCheckpoint` cutting the lineage
  so round N doesn't replay rounds 1..N-1.

Determinism: ties on the pair count break lexicographically (count
DESC, pair ASC) — the learned merge TABLE is a pure function of the
corpus. Words are restricted to lowercase ASCII runs so symbol
boundaries are engine-portable (multilingual corpora go through
byte-level BPE in production; code-unit vs grapheme splitting of CJK
differs across engines, so the portable surface stops at ASCII).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASCII_WORD_RE = "^[a-z]+$"


def word_frequencies(docs: DataFrame, text_col: str) -> DataFrame:
    """Corpus → (w, freq) for lowercase-ASCII words. The single
    corpus-sized pass; everything downstream is vocab-sized."""
    from spacex_data_engineering_pipeline_spark.functions.text import words

    return (
        docs.select(F.explode(words(F.lower(F.col(text_col)))).alias("w"))
        .filter(F.col("w").rlike(ASCII_WORD_RE))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def char_symbols(wf: DataFrame) -> DataFrame:
    """(w, freq) → (w, freq, s): initial symbol sequences = characters.
    Words shorter than 2 symbols carry no pairs and are dropped —
    they can never participate in a merge."""
    return wf.filter(F.length("w") >= 2).withColumn(
        "s", F.split(F.col("w"), "")
    )


def pair_counts(sym: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency: the BPE merge
    statistic. zip_with of the symbol array with its shift-by-one keeps
    the explode O(symbols) per word and inside codegen."""
    pairs = F.filter(
        F.zip_with(
            F.col("s"),
            F.slice(F.col("s"), 2, 1 << 30),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda p: p.isNotNull(),
    )
    return (
        sym.select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("weighted_count"))
    )


def top_pairs(sym: DataFrame, k: int) -> DataFrame:
    """Top-k merge candidates, deterministic total order (count DESC,
    pair ASC) — TakeOrderedAndProject over the vocab-sized agg."""
    return pair_counts(sym).orderBy(
        F.col("weighted_count").desc(), F.col("pair").asc()
    ).limit(k)


def _apply_merge_py(s: list[str], a: str, b: str) -> list[str]:
    """Left-to-right non-overlapping merge of (a, b) → a+b — the exact
    Sennrich semantics ('aaa' with merge (a,a) → ['aa','a'])."""
    out: list[str] = []
    i = 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def apply_merge(sym: DataFrame, a: str, b: str) -> DataFrame:
    """Apply one learned merge across the vocab table via an
    Arrow-batched mapInPandas (the scan is inherently sequential per
    word; the table is vocab-sized so the Python loop is model-work,
    not data-work)."""
    schema = StructType(
        [
            StructField("w", StringType(), False),
            StructField("freq", LongType(), False),
            StructField("s", ArrayType(StringType(), False), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            pdf = pdf.copy()
            pdf["s"] = [_apply_merge_py(list(s), a, b) for s in pdf["s"]]
            yield pdf

    return sym.select("w", "freq", "s").mapInPandas(run, schema)


def encode_token_counts(
    docs: DataFrame, text_col: str, id_col: str, n_merges: int
) -> DataFrame:
    """Tokenizer APPLY — the other half of the BPE story: encode every
    document with the learned merge table and return per-document
    (n_words, n_bpe_tokens).

    The scale insight: applying BPE to a corpus is NOT a per-document
    merge loop. ``train_bpe``'s final vocab table already maps every
    distinct word to its fully-merged symbol sequence, so encoding is
    one explode + one broadcast join against the vocab-sized dimension
    (w → symbol count) + one groupBy — zero per-document Python, the
    corpus streams through codegen. Words with a single character never
    enter the vocab (no pairs to merge) and count as one token.

    Returns (id_col, n_words BIGINT, n_bpe_tokens BIGINT); documents
    with no ASCII words produce no row (nothing to encode).
    """
    from spacex_data_engineering_pipeline_spark.functions.text import words

    _, sym = train_bpe(docs, text_col, n_merges)
    vocab = sym.select("w", F.size("s").cast("long").alias("n_sym"))
    docw = docs.select(
        F.col(id_col), F.explode(words(F.lower(F.col(text_col)))).alias("w")
    ).filter(F.col("w").rlike(ASCII_WORD_RE))
    return (
        docw.join(F.broadcast(vocab), "w", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.coalesce(F.col("n_sym"), F.lit(1))).alias("n_bpe_tokens"),
        )
    )


def train_bpe(
    docs: DataFrame, text_col: str, n_merges: int
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge table and the final symbolized vocab DataFrame.

    Each round: one vocab-sized pair-count job + one driver argmax row
    (the documented bounded-probe class) + one Arrow merge pass;
    ``localCheckpoint`` pins the round's result so lineage doesn't
    re-run prior merges. Stops early if no pair is left.
    """
    sym = char_symbols(word_frequencies(docs, text_col)).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = top_pairs(sym, 1).first()
        if best is None:
            break
        a, b = best["pair"].split(" ", 1)
        merges.append((a, b))
        sym = apply_merge(sym, a, b).localCheckpoint()
    return merges, sym
