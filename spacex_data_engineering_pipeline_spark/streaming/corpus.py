"""Streaming corpus preparation: the batch corpus-prep pipeline
(scrub → quality gate → dedup) as a continuous ingest.

A training-data pipeline rarely gets its corpus as one batch — crawls
and uploads arrive continuously. This composes the SAME column
expressions the batch path uses (``functions/text.py`` — scrub_pii,
quality/repetition scoring are pure codegen, so they apply to a
streaming DataFrame unchanged) with stream-native dedup:

- exact content dedup via ``dropDuplicates`` on the content fingerprint
  (xxhash64 of the text — fixed-width state key, never the text itself);
- state is bounded with a watermark when the stream carries an
  event-time column, unbounded otherwise (bounded key domains only —
  see ``streaming/dedup.py`` for the trade).

Run with ``Trigger.AvailableNow`` for catch-up-then-stop semantics or
continuously for live ingest; the sink is an append-only parquet table
a downstream ``pack``/``shard`` batch job reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.functions.text import (
    quality_score,
    scrub_pii,
    token_count,
)


def corpus_prep_stream(
    docs_stream: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.3,
    min_tokens: int = 5,
    event_time_col: str | None = None,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Scrub PII, score, filter, and dedup a streaming documents source.

    Emits the input columns with ``text`` replaced by its scrubbed form,
    plus ``quality_score``, ``n_tokens``, and per-kind scrub counts —
    the metadata a curation dashboard aggregates per micro-batch.
    Everything before the dedup is a stateless projection (runs at
    scan speed in any trigger mode); the dedup is the only stateful
    operator.
    """
    scrubbed, counts = scrub_pii(F.col(text_col))
    prepared = (
        docs_stream.withColumn("__scrubbed", scrubbed)
        .withColumn("quality_score", quality_score(F.col("__scrubbed")))
        .withColumn("n_tokens", token_count(F.col("__scrubbed")).cast("long"))
        .withColumn("__fp", F.xxhash64(F.col("__scrubbed")))
    )
    for kind, cnt in counts.items():
        prepared = prepared.withColumn(f"n_scrubbed_{kind}", cnt)
    filtered = prepared.filter(
        (F.col("quality_score") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    ).withColumn(text_col, F.col("__scrubbed")).drop("__scrubbed")

    if event_time_col is not None:
        from spacex_data_engineering_pipeline_spark.streaming.event_time import (
            restore_ntz,
            to_instant_for_watermark,
        )

        filtered, was_ntz = to_instant_for_watermark(filtered, event_time_col)
        deduped = filtered.withWatermark(
            event_time_col, watermark_delay
        ).dropDuplicatesWithinWatermark(["__fp"])
        deduped = deduped.withColumn(
            event_time_col, restore_ntz(F.col(event_time_col), was_ntz)
        )
    else:
        deduped = filtered.dropDuplicates(["__fp"])
    return deduped.drop("__fp")
