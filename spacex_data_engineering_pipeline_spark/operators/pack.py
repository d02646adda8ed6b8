"""Distributed prefix sums and training-sequence packing.

Concat-and-chunk packing — concatenate documents in a stable order and
cut the token stream every ``seq_len`` tokens — is how most training
pipelines turn a ragged corpus into fixed-length sequences. The core
primitive is a GLOBAL running total of token counts in corpus order,
which a naive ``Window.orderBy(...)`` computes on ONE reducer (Spark
plans an empty-partitionBy window as a single-partition sort — a
non-starter at 100 TB).

``with_global_offset`` is the scale-safe version — a two-phase
distributed prefix sum with exactly ONE full-table shuffle:

1. bucket each row by VALUE range of the order column (cheap min/max
   probe picks the bucket width), so bucket ids are monotone in the
   global order — unlike ``spark_partition_id`` after a range shuffle,
   a value-derived bucket is a plain expression, so the window's own
   hash shuffle on it is the only time the table moves;
2. within-bucket exclusive running sum (each bucket sorts only itself);
3. per-bucket totals via a second column-pruned scan with map-side
   partial aggregation — its shuffle moves O(buckets × tasks) partial
   sums, never rows;
4. exclusive-prefix the totals over bucket id (an O(buckets) metadata
   window) and broadcast-join the base offsets back.

Bucket boundaries depend only on min/max, so the result is a pure
function of the data — deterministic whenever the order column is
unique. Heavily clustered order values can skew buckets (same caveat
as any range partitioning); AQE's skew handling and a larger
``n_buckets`` are the dials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def with_global_offset(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "offset",
    n_partitions: int | None = None,
) -> DataFrame:
    """Append the EXCLUSIVE global running sum of ``value_col`` in
    ``order_col`` order (first row gets 0). ``order_col`` must be
    numeric and unique — ties would make attribution among equal keys
    ambiguous, and the bucket derivation is integer arithmetic.
    """
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    lo_hi = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).first()
    if lo_hi["lo"] is None:  # empty input: nothing to offset
        return df.withColumn(out_col, F.lit(0).cast("long"))
    lo, hi = int(lo_hi["lo"]), int(lo_hi["hi"])
    width = max(1, (hi - lo + n) // n)  # ceil(span / n)

    # `div` (integer division) keeps bucket math exact for 64-bit ids —
    # float `/`+floor would corrupt above 2^53.
    bucketed = df.withColumn(
        "__b", F.expr(f"(cast({order_col} as bigint) - {lo}) div {width}")
    )
    wl = Window.partitionBy("__b").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = bucketed.withColumn(
        "__local", F.coalesce(F.sum(value_col).over(wl), F.lit(0)).cast("long")
    )

    # Bucket totals from a second column-pruned scan: partial (map-side)
    # aggregation means its shuffle moves only O(buckets × map tasks)
    # partial sums — never the table. The window's hash shuffle above is
    # the single full-table movement in the whole plan. (Computing the
    # totals from the window output instead would need the window's
    # exchange reused, which column pruning defeats; a second cheap scan
    # beats a second full shuffle at any scale.)
    totals = bucketed.groupBy("__b").agg(F.sum(value_col).alias("__bsum"))
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    bases = totals.select(
        "__b", F.coalesce(F.sum("__bsum").over(wb), F.lit(0)).alias("__base")
    )

    return (
        local.join(F.broadcast(bases), "__b")
        .withColumn(out_col, (F.col("__base") + F.col("__local")).cast("long"))
        .drop("__b", "__local", "__base")
    )


def rank_probe(df: DataFrame, order_col: str) -> tuple[int | None, int | None, int]:
    """ONE column-pruned job returning ``(min, max, count)`` of
    ``order_col``. Callers that also need the global row count (e.g.
    the NTILE closed form in ``order_price_quartiles``) use this
    instead of a separate ``df.count()``: pass the (min, max) back to
    ``with_distributed_rank`` via ``probe`` and the rank primitive
    skips its own min/max job — one probe total."""
    row = df.agg(
        F.min(order_col).alias("lo"),
        F.max(order_col).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    lo = int(row["lo"]) if row["lo"] is not None else None
    hi = int(row["hi"]) if row["hi"] is not None else None
    return lo, hi, int(row["n"])


def with_distributed_rank(
    df: DataFrame,
    order_col: str,
    part_cols: list[str] | None = None,
    tiebreak_cols: list[str] | None = None,
    out_col: str = "rank",
    n_buckets: int | None = None,
    probe: tuple[int | None, int | None] | None = None,
) -> DataFrame:
    """Append the exact 1-based ``row_number`` of each row within its
    ``part_cols`` group, ordered by ``(order_col, *tiebreak_cols)`` —
    WITHOUT the single-reducer sort a ``Window.partitionBy(few-large-
    strata).orderBy(...)`` (or, with no partitions at all, a global
    ``Window.orderBy``) plans.

    Same two-phase prefix-sum shape as ``with_global_offset``, extended
    two ways:

    - sub-bucketing: rows hash-shuffle on ``(part_cols, value-range
      bucket of order_col)``, so even a single giant stratum spreads
      over ``n_buckets`` reducers; equal ``order_col`` values share a
      bucket by construction (the bucket is a pure function of the
      value), so cross-bucket order is total and exact;
    - tiebreaks: ``order_col`` need not be unique — ties are resolved
      inside their bucket by ``tiebreak_cols`` (pass a unique key for a
      deterministic total order).

    The per-(group, bucket) counts are prefix-summed per group over an
    O(groups × buckets) metadata table and broadcast back: one
    full-table shuffle total, never a single-partition exchange of data
    rows. ``order_col`` must be numeric (bucket arithmetic); the global
    min/max probe is a column-pruned scan.
    """
    parts = list(part_cols or [])
    ties = list(tiebreak_cols or [])
    n = n_buckets or df.sparkSession.sparkContext.defaultParallelism
    if probe is not None:
        lo_hi = {"lo": probe[0], "hi": probe[1]}  # caller-supplied, one job saved
    else:
        lo_hi = df.agg(
            F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
        ).first()
    if lo_hi["lo"] is None:
        # empty input OR every order value NULL: all rows land in the
        # sentinel bucket below; any lo/width works
        lo, width = 0, 1
    else:
        lo, hi = int(lo_hi["lo"]), int(lo_hi["hi"])
        width = max(1, (hi - lo + n) // n)  # ceil(span / n)

    # bigint cast + integer div: monotone (truncation preserves order)
    # and exact for 64-bit keys; equal values always co-bucket. NULL
    # order values map to sentinel bucket -1 — before every real bucket,
    # matching the NULLS FIRST order the Window formulation this
    # replaces gave them — instead of a NULL __b that would vanish
    # through the equi-join below.
    bucketed = df.withColumn(
        "__b",
        F.when(F.col(order_col).isNull(), F.lit(-1).cast("bigint")).otherwise(
            F.expr(f"(cast({order_col} as bigint) - {lo}) div {width}")
        ),
    )
    wl = Window.partitionBy(*parts, "__b").orderBy(order_col, *ties)
    local = bucketed.withColumn("__lrn", F.row_number().over(wl))

    totals = bucketed.groupBy(*parts, "__b").agg(F.count(F.lit(1)).alias("__bn"))
    wb = Window.partitionBy(*parts).orderBy("__b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # NULL-safe join keys for part_cols: a NULL part group must match
    # its own base row, not drop out of the inner join. (__b is never
    # NULL thanks to the sentinel, so plain equality is fine there.)
    bases = totals.select(
        *[F.col(c).alias(f"__p{i}") for i, c in enumerate(parts)],
        F.col("__b").alias("__bb"),
        F.coalesce(F.sum("__bn").over(wb), F.lit(0)).alias("__base"),
    )
    cond = F.col("__b") == F.col("__bb")
    for i, c in enumerate(parts):
        cond = cond & F.col(c).eqNullSafe(F.col(f"__p{i}"))
    return (
        local.join(F.broadcast(bases), cond)
        .withColumn(out_col, (F.col("__base") + F.col("__lrn")).cast("long"))
        .drop("__b", "__bb", "__lrn", "__base", *[f"__p{i}" for i in range(len(parts))])
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    token_col: str,
    seq_len: int,
    n_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid head to
    tail in ``order_col`` order and the stream is cut every ``seq_len``
    tokens. Adds:

    - ``start_offset`` — the doc's first token's position in the stream;
    - ``pack_id``      — which sequence the doc STARTS in
      (``start_offset div seq_len``; a doc longer than the remaining
      room straddles into the next pack, as in standard
      concat-and-chunk — no padding, no document reordering);
    - ``offset_in_pack`` — position within that sequence.

    Deterministic (pure function of the corpus + order), so every
    re-run and every downstream trainer derives the identical layout.
    """
    out = with_global_offset(
        df, order_col, token_col, out_col="start_offset", n_partitions=n_partitions
    )
    return out.withColumn(
        "pack_id", F.floor(F.col("start_offset") / seq_len).cast("long")
    ).withColumn(
        "offset_in_pack", F.pmod(F.col("start_offset"), F.lit(seq_len)).cast("long")
    )


BESTFIT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_tokens", LongType(), False),
        StructField("group_id", LongType(), False),
        StructField("local_bin", LongType(), False),
    ]
)


def pack_sequences_bestfit(
    df: DataFrame,
    id_col: str,
    token_col: str,
    seq_len: int,
    n_groups: int = 64,
) -> DataFrame:
    """BOUNDARY-RESPECTING sequence packing: whole documents bin-pack
    into fixed-capacity packs — no document ever straddles a pack
    boundary (``pack_sequences`` cuts the concatenated stream wherever
    ``seq_len`` lands, so ~1 doc per pack is split; trainers that mask
    cross-document attention want whole docs).

    Algorithm: best-fit-decreasing within deterministic groups.
    Documents hash into ``n_groups`` groups (``id mod G`` — a pure
    function, SQL-replayable); each group sorts by (tokens DESC, id
    ASC) and runs exact best-fit — place each doc into the FULLEST
    bin it still fits (ties → lowest bin id), else open a new bin.
    A doc longer than ``seq_len`` fits no bin and naturally opens its
    own (the trainer's truncation problem, flagged by load > seq_len —
    no special case in the algorithm, so the oracle replay has none
    either). Group-local bin ids become global pack ids by
    INTERLEAVING (``group + G·bin``) — closed-form, zero extra
    shuffle; labels are sparse, not dense (relabel with
    ``with_distributed_rank`` over distinct ids if a trainer needs
    0..B-1).

    Scale: ONE hash shuffle on the group key moves only (id, tokens)
    pairs — never text; each group packs sequentially in
    O(n log n) (sorted-loads bisect) inside ``applyInPandas``, and
    ``n_groups`` is the parallelism/memory dial (each group holds
    corpus/G doc METADATA rows). Packing efficiency loses only the
    per-group tail: each group is a hash-random sample of the length
    distribution, so per-group BFD stays within the BFD guarantee of
    its own optimum (pytest pins the measured efficiency and the
    11/9·OPT bound corpus-wide).

    Output: (``id_col``, ``token_col``, pack_id) — deterministic pure
    function of the corpus.
    """
    import bisect

    import pandas as pd

    cap = int(seq_len)

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        docs = sorted(
            zip(pdf["__doc"].astype("int64"), pdf["__tok"].astype("int64")),
            key=lambda t: (-t[1], t[0]),
        )
        loads: list[tuple[int, int]] = []  # (load, bin_idx) sorted
        n_bins = 0
        out_doc, out_tok, out_bin = [], [], []
        for doc_id, ln in docs:
            thr = cap - ln
            pos = bisect.bisect_right(loads, (thr, float("inf"))) - 1
            if pos >= 0:
                v = loads[pos][0]
                # smallest bin id among the max-load fitting bins
                first = bisect.bisect_left(loads, (v, -1))
                _, idx = loads[first]
                del loads[first]
                bisect.insort(loads, (v + ln, idx))
            else:
                idx = n_bins
                n_bins += 1
                bisect.insort(loads, (ln, idx))
            out_doc.append(doc_id)
            out_tok.append(ln)
            out_bin.append(idx)
        g = int(pdf["__g"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame(
            {
                "doc_id": pd.Series(out_doc, dtype="int64"),
                "n_tokens": pd.Series(out_tok, dtype="int64"),
                "group_id": pd.Series([g] * len(out_doc), dtype="int64"),
                "local_bin": pd.Series(out_bin, dtype="int64"),
            }
        )

    packed = (
        df.select(
            F.col(id_col).cast("long").alias("__doc"),
            F.col(token_col).cast("long").alias("__tok"),
            F.pmod(F.col(id_col).cast("long"), F.lit(n_groups)).alias("__g"),
        )
        .groupBy("__g")
        .applyInPandas(pack_group, BESTFIT_SCHEMA)
    )
    return packed.select(
        F.col("doc_id").alias(id_col),
        F.col("n_tokens").alias(token_col),
        (F.col("group_id") + F.lit(n_groups) * F.col("local_bin"))
        .cast("long")
        .alias("pack_id"),
    )
