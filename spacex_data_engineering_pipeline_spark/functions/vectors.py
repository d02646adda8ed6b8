"""Vector expressions over ``array<float/double>`` embedding columns.

Dot products / norms / cosine run through ``zip_with`` + ``aggregate``
(higher-order functions): JVM-side, codegen-friendly, left-to-right
summation — the same evaluation order portable SQL engines use, so
results are bit-identical for oracle comparison.

Scale: for brute-force scoring of N vectors × 1 query this is a single
narrow map stage (no shuffle). For top-k over many queries use the LSH
path in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Left-to-right dot product in double precision."""
    return F.aggregate(
        F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either norm is zero."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def cosine_arrow(a: Column, b: Column) -> Column:
    """BIT-IDENTICAL twin of :func:`cosine` for pair-verification
    volume: an Arrow-batched pandas UDF instead of nested HOFs.

    The HOF fold is interpreted per element — ~3 lambda nodes × dim
    per pair never enter whole-stage codegen (the documented
    nested-HOF wall; measured 60.7 s on 8.3M LSH candidate pairs at
    sf1.0). numpy matmuls would be 10× faster again but use pairwise/
    BLAS summation, whose last-ulp drift could flip a ROUND(·, 6)
    grade; ``np.cumsum(..., axis=1)`` is DEFINED as the running sum,
    i.e. the same strict left-to-right order as the fold and DuckDB's
    ``list_dot_product`` — so every double here is the exact bits the
    HOF produces, just evaluated in C loops per Arrow batch
    (exactness pinned bitwise in tests/test_lm_cluster_sampling.py).
    Zero-norm/NULL inputs yield NULL like :func:`cosine`.
    """
    import numpy as np
    import pandas as pd

    @F.pandas_udf("double")
    def _cos(pa, pb):
        out = np.full(len(pa), np.nan)
        mask = pa.notna().to_numpy() & pb.notna().to_numpy()
        if mask.any():
            ma = np.stack([np.asarray(v, dtype=np.float64) for v in pa[mask]])
            mb = np.stack([np.asarray(v, dtype=np.float64) for v in pb[mask]])
            d = np.cumsum(ma * mb, axis=1)[:, -1]
            na = np.sqrt(np.cumsum(ma * ma, axis=1)[:, -1])
            nb = np.sqrt(np.cumsum(mb * mb, axis=1)[:, -1])
            ok = (na > 0) & (nb > 0)
            vals = np.where(ok, d / np.where(ok, na * nb, 1.0), np.nan)
            out[mask] = vals
        return pd.Series(out)

    return _cos(to_double_array(a), to_double_array(b))
