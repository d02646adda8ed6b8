"""Structured Streaming surface: the incremental ingestion loop as a
checkpointed stream (SURVEY §2.9 — the reference's hand-rolled
micro-batch CDC loop is exactly what Structured Streaming formalizes),
plus event-time windowed aggregation helpers used by the catalog.
"""
