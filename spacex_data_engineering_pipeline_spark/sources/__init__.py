"""Source connectors: schema-enforced readers for the launch domain.

The reference's sources are HTTP endpoints (src/api.py). Here the
connector surface is a small protocol returning DataFrames, with a
local implementation (parquet/JSON/rows) used by tests and a REST
implementation stub whose pagination/filter semantics mirror the
reference — network access is intentionally not exercised in this
environment.
"""
