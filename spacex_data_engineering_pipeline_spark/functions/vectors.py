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


def sq8_codes(v: Column) -> tuple[Column, Column]:
    """Symmetric int8 scalar quantization of a vector column: codes
    ``floor(x / amax * 127 + 0.5)`` with per-vector scale
    ``amax = max|x|`` — at 100 TB the embedding column IS the storage
    bill, and SQ8 is the 4× cut (float32 → int8 + one float scale)
    that keeps dot products usable (``code·code`` rescaled by
    ``s_a·s_b/127²``), the cheap tier below PQ's 32× (operators/pq.py).

    Returns ``(scale, codes)`` as pure Column expressions — the whole
    quantizer runs JVM-side inside whole-stage codegen at scan speed,
    no UDF, no shuffle. Every arithmetic step (divide, scale, the
    half-up ``floor(·+0.5)`` round) is an IEEE-exact double op any
    engine reproduces bit-for-bit, so the CODES THEMSELVES are
    oracle-gradable — not just their statistics. A zero vector (the
    only vector a symmetric quantizer cannot scale) gets scale 0 and
    all-zero codes; an EMPTY vector gets scale NULL and empty codes
    (``array_max`` over an empty array is NULL — matching DuckDB's
    ``list_max``, so both engines grade it identically); NULL
    propagates. Codes span [-127, 127] (never -128: |x| ≤ amax ⇒
    floor(±127 + 0.5) bounds).
    """
    dv = to_double_array(v)
    amax = F.array_max(F.transform(dv, F.abs))
    codes = F.when(
        amax > 0,
        F.transform(dv, lambda x: F.floor(x / amax * 127.0 + 0.5).cast("int")),
    ).otherwise(F.transform(dv, lambda x: F.lit(0)))
    return amax, codes


def sq8_reconstruction_error(v: Column, scale: Column, codes: Column) -> Column:
    """Squared L2 reconstruction error of SQ8 codes vs the original
    vector, computed as ``⟨v,v⟩ − 2⟨v,r⟩ + ⟨r,r⟩`` with
    ``r = codes·scale/127`` — three left-to-right HOF folds, the same
    evaluation order as DuckDB's ``list_dot_product``, so the audit
    metric is bit-identical across engines (the expanded form keeps
    every operand a dot product instead of relying on an engine's
    fold-over-zip order for Σ(x−r)²)."""
    dv = to_double_array(v)
    recon = F.transform(codes, lambda c: c.cast("double") * scale / 127.0)
    return dot(dv, dv) - 2 * dot(dv, recon) + dot(recon, recon)


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


_JL_QUANT = 1048576.0  # 2^20 — the engine-wide fixed-point convention


def jl_project(v: Column, planes: list[list[int]]) -> Column:
    """Integer Johnson-Lindenstrauss projection — the cheapest
    dimensionality-reduction tier (below SQ8's 4× and PQ's 32×: here
    the DIMENSION shrinks, e.g. 64→16 = 4× smaller AND 4× fewer flops
    per downstream distance): out_d = Σ_j floor(v_j·2^20)·h_dj with
    ``planes`` the portable md5-derived integer hyperplanes
    (operators/similarity.py:portable_hyperplanes — plain integer
    literals any engine regenerates). Every output coordinate is an
    EXACT int64 (|q| ≤ 2^21, |h| < 2^19, dim ≤ 64 ⇒ |out| ≤ 2^46), so
    unlike a float Gaussian JL the projected vectors — and every
    distance computed on them — are bit-identical across Spark, numpy,
    and DuckDB: the random projection itself is oracle-gradable.

    Pure Column expressions (transform + zip_with/aggregate folds per
    plane, planes entering as ONE foldable literal each): whole-stage
    codegen, no UDF, no shuffle — scan-speed at any corpus size.
    NULL vectors project to NULL.
    """
    q = F.transform(
        to_double_array(v), lambda x: F.floor(x * F.lit(_JL_QUANT))
    )
    comps = []
    for p in planes:
        plit = F.split(F.lit(",".join(str(int(c)) for c in p)), ",").cast(
            "array<bigint>"
        )
        comps.append(
            F.aggregate(
                F.zip_with(q, plit, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
        )
    return F.array(*comps)


def jl_scaled(proj: Column) -> Column:
    """Rescale raw JL coordinates back to data scale:
    floor(out_d / 2^20) — an exact power-of-two divide of a ≤2^46
    int (float64-exact), so squared-L2 distances over the scaled
    coordinates stay inside int64 (≤ 2^27-bounded coords ⇒ a 16-dim
    L2² ≤ 2^58) — the overflow headroom the shortlist ranking needs."""
    return F.transform(
        proj, lambda x: F.floor(x.cast("double") / F.lit(_JL_QUANT))
    )
