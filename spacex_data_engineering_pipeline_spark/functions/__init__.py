"""Scalar/array function library — all built on native pyspark.sql.functions
so every expression stays inside whole-stage codegen (no Python UDFs in
the hot path; the reference needs zero UDFs for parity, SURVEY §2.10).
"""
