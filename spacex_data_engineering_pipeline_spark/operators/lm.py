"""Distributed n-gram language-model quality scoring.

The CCNet / Gopher-style corpus filter: train a bigram LM on the corpus
itself, score every document by its average negative log-likelihood, and
drop the tails (gibberish scores high, boilerplate scores low). The
reference has no LM surface (it's a REST-ingest pipeline,
api.py:80-174); this is north-star §2.11 breadth for a 100 TB
training-data engine, where perplexity filtering is a standard pass.

Shape, and why it scales:

- **Training is one shuffle per n-gram order.** Token and bigram counts
  are plain ``groupBy().count()`` — map-side partial aggregation means
  the shuffle carries (gram, partial_count) pairs, bounded by vocabulary
  size per partition, not corpus size.
- **Scoring is a fact-to-dim join, not a per-doc loop.** Each document
  explodes into its bigram occurrences; occurrences join the count
  tables on the gram key (AQE decides broadcast vs shuffle — at 100 TB
  the bigram table is vocab², so it stays a shuffle join with partial
  aggregation; the unigram side often broadcasts). One groupBy(doc)
  brings back the per-document mean. No driver-side state beyond the
  two scalar constants (vocab size, smoothing).
- **Laplace (add-one) smoothing** keeps every bigram probability
  finite: P(w2|w1) = (C(w1,w2) + 1) / (C(w1) + V). The NLL per
  occurrence is ``ln(C(w1)+V) - ln(C(w1,w2)+1)`` — logs of integers,
  so both engines evaluate the identical rational argument and the
  per-doc MEAN is rounded before hashing (the same float-parity rule
  as the cosine queries).

Portability: tokenization is the catalog-wide whitespace contract
(``functions/text.py::words``), counts are exact integers, and the
vocabulary size is a one-row driver probe (the documented bounded-probe
pattern, like the ANN query vector) so the score plan itself stays a
pure two-join pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.functions.text import words

_SLICE_ALL = 1 << 30


def doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Explode each document into its bigram OCCURRENCES (multiplicity
    preserved — scoring weighs a repeated bigram every time it occurs).

    Returns (id, w1, w2), one row per adjacent token pair. The zip of
    the token array with its shift-by-one is O(tokens) per row and
    stays in whole-stage codegen; documents under 2 tokens vanish
    (zip_with pads with NULL, the filter drops them).
    """
    toks = docs.select(F.col(id_col), words(F.col(text_col)).alias("__w"))
    pairs = F.filter(
        F.zip_with(
            F.col("__w"),
            F.slice(F.col("__w"), 2, _SLICE_ALL),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        lambda p: p["w2"].isNotNull(),
    )
    return toks.select(F.col(id_col), F.explode(pairs).alias("__p")).select(
        id_col, F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2")
    )


def unigram_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """Global token-occurrence counts: (w, c1). One explode + one
    map-side-combined groupBy."""
    return (
        docs.select(F.explode(words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )


def bigram_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Global bigram-occurrence counts: (w1, w2, c2)."""
    return (
        doc_bigrams(docs, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )


def vocab_size(docs: DataFrame, text_col: str) -> int:
    """Distinct-token count — the Laplace smoothing denominator. A
    bounded one-row driver probe (same class as the ANN query-vector
    fetch); the value is folded into the score plan as a literal."""
    return int(
        docs.select(F.explode(words(F.col(text_col))).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
        .first()["v"]
    )


def dsir_log_ratio(
    docs: DataFrame,
    target_docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by how much more likely it is under a TARGET-domain LM
    than under the general SOURCE LM — the weight that resamples a raw
    crawl toward a curated target distribution. Both LMs are add-one-
    smoothed bigram models trained on their own slice (the
    ``score_docs_nll`` machinery, twice); the per-doc score is the
    average log ratio over its bigrams:

        avg_log_ratio = avg( nll_source − nll_target )

    Positive ⇒ the doc looks more like the target than the source ⇒
    up-sample. Plan: two vocab-bounded count-pairs (one per LM), then
    ONE pass over the occurrence table with four keyed dim joins
    (source/target × unigram/bigram) and a doc-keyed average — no
    per-doc loop, nothing collects; words unseen by the target LM
    smooth through COALESCE(count, 0) like any unseen bigram.

    Returns (id, n_bigrams, avg_log_ratio) for docs with ≥1 bigram.
    """
    v_s = float(vocab_size(docs, text_col))
    v_t = float(vocab_size(target_docs, text_col))
    occ = doc_bigrams(docs, id_col, text_col)
    c2s = bigram_counts(docs, id_col, text_col).withColumnRenamed("c2", "c2s")
    c1s = unigram_counts(docs, text_col).withColumnRenamed("c1", "c1s")
    c2t = bigram_counts(target_docs, id_col, text_col).withColumnRenamed("c2", "c2t")
    c1t = unigram_counts(target_docs, text_col).withColumnRenamed("c1", "c1t")

    nll_s = F.log(F.col("c1s") + F.lit(v_s)) - F.log(
        F.coalesce(F.col("c2s"), F.lit(0)) + F.lit(1.0)
    )
    nll_t = F.log(F.coalesce(F.col("c1t"), F.lit(0)) + F.lit(v_t)) - F.log(
        F.coalesce(F.col("c2t"), F.lit(0)) + F.lit(1.0)
    )
    return (
        occ.join(c2s, ["w1", "w2"], "left")
        .join(c2t, ["w1", "w2"], "left")
        .join(c1s.withColumnRenamed("w", "w1"), ["w1"], "inner")
        .join(c1t.withColumnRenamed("w", "w1"), ["w1"], "left")
        .withColumn("__lr", nll_s - nll_t)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("__lr"), round_to).alias("avg_log_ratio"),
        )
    )


def score_docs_nll(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """Per-document average bigram negative log-likelihood under the
    corpus's own add-one-smoothed bigram LM.

    Returns (id, n_bigrams, avg_nll) for every document with ≥ 1
    bigram. Low avg_nll ⇒ the document looks like the corpus
    (boilerplate / duplicates); high avg_nll ⇒ out-of-distribution
    (gibberish, wrong language). The classic filter keeps the middle.

    Plan: two count shuffles (training), a left join occurrences→c2
    (unseen bigrams smooth to count 0), an inner join →c1 (w1 always
    exists — it came from the same corpus), one groupBy(doc). Every
    stage is partial-agg or keyed-join; nothing collects.
    """
    v = vocab_size(docs, text_col)
    occ = doc_bigrams(docs, id_col, text_col)
    c2 = bigram_counts(docs, id_col, text_col)
    c1 = unigram_counts(docs, text_col)

    nll = F.log(F.col("c1") + F.lit(float(v))) - F.log(
        F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1.0)
    )
    return (
        occ.join(c2, ["w1", "w2"], "left")
        .join(c1.withColumnRenamed("w", "w1"), ["w1"], "inner")
        .withColumn("__nll", nll)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("__nll"), round_to).alias("avg_nll"),
        )
    )
