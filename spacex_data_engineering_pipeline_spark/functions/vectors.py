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
