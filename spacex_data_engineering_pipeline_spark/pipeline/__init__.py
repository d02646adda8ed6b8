"""Pipeline orchestration: the reference's 7-step incremental ETL loop
(src/ingest.py) as driver-level coordination over DataFrame jobs.
"""
