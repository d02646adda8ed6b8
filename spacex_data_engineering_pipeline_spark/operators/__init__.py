"""Relational + data-pipeline operators the DataFrame API doesn't ship
as single calls: PK upsert, near-duplicate detection (MinHash-LSH,
SimHash, n-gram Jaccard), similarity search, and multimodal plumbing.

Each operator is a composition of native DataFrame ops where semantics
allow; Arrow-batched pandas UDFs only where vectorized Python genuinely
wins (SimHash bit-packing); never row-at-a-time Python.
"""
