"""Z-order (Morton-curve) data layout: cluster a table on MULTIPLE
columns at once so that file/row-group min-max statistics prune
multi-dimensional predicates — the layout trick behind Delta's
OPTIMIZE ZORDER BY and equivalent lakehouse clustering.

Why it matters at 100 TB: a table range-sorted on one column prunes
scans on that column only; a selective 2-D box predicate
(``part BETWEEN a AND b AND supp BETWEEN c AND d``) still touches
every file. Interleaving the bits of min-max-quantized column values
gives a 1-D sort key whose contiguous ranges are (approximate)
hyper-rectangles, so EVERY clustered dimension gets statistics
locality: parquet footer min/max per file (and per row group) exclude
most of the table for box predicates on any subset of the z-columns.
Spark's parquet reader applies those stats automatically under
predicate pushdown — the operator only has to produce the layout.

Mechanics: one metadata-sized min/max probe per column (the same
pattern as ``operators/pack.py::with_distributed_rank``), linear
quantization to ``bits``-bit integers, pure-codegen bit interleave
(shift/AND/OR chain — no UDF), then ``repartitionByRange`` on the
z-value (range partitioner = contiguous z-runs per file) with an
in-partition sort so row groups inherit the locality too.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(quantized: list[Column], bits: int) -> Column:
    """Morton-interleave ``len(quantized)`` bits-bit integers into one
    long: bit b of column i lands at position b*n + i."""
    n = len(quantized)
    parts = []
    for b in range(bits):
        for i, q in enumerate(quantized):
            bit = F.call_function("shiftright", q, F.lit(b)).bitwiseAND(
                F.lit(1).cast("long")
            )
            parts.append(
                F.call_function("shiftleft", bit, F.lit(b * n + i))
            )
    return reduce(lambda a, c: a.bitwiseOR(c), parts)


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 12
) -> tuple[DataFrame, str]:
    """Attach a ``__z`` Morton key over ``cols`` (numeric). One
    metadata-sized min/max probe; quantization and interleave are
    codegen expressions. Returns (df_with_z, "__z")."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    stats = df.agg(*aggs).collect()[0]
    top = (1 << bits) - 1
    quantized = []
    for c in cols:
        lo, hi = float(stats[f"__lo_{c}"]), float(stats[f"__hi_{c}"])
        span = hi - lo if hi > lo else 1.0
        q = F.least(
            F.lit(top).cast("long"),
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * (top + 1)).cast(
                "long"
            ),
        )
        quantized.append(F.greatest(F.lit(0).cast("long"), q))
    return df.withColumn("__z", _interleave(quantized, bits)), "__z"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 12,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Morton curve over ``cols``: range partition by z (contiguous
    z-runs per file) + in-partition sort (row-group locality)."""
    zdf, zcol = zorder_value(df, cols, bits)
    (
        zdf.repartitionByRange(n_files, F.col(zcol))
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )


def files_overlapping_box(path: str, box: dict[str, tuple]) -> tuple[int, int]:
    """Footer-stats probe (the pruning a stats-aware reader performs):
    how many parquet files in ``path`` could contain rows inside the
    box (per-column [lo, hi])? Returns (overlapping, total)."""
    import os

    import pyarrow.parquet as pq

    files = [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    ]
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        overlaps = True
        for col, (lo, hi) in box.items():
            c_lo, c_hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names[col]).statistics
                c_lo = st.min if c_lo is None else min(c_lo, st.min)
                c_hi = st.max if c_hi is None else max(c_hi, st.max)
            if c_hi < lo or c_lo > hi:
                overlaps = False
                break
        hit += overlaps
    return hit, len(files)
