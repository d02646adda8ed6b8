"""Query plans: the engine's declarative query catalog.

``queries.py`` holds the driver-checked catalog (DataFrame builder +
DuckDB oracle SQL per operator). ``launch_analytics.py`` holds the
launch-domain analytics from the reference, runnable on any DataFrame
with the launches schema.
"""
