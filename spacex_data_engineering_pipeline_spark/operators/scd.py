"""Slowly-changing-dimension Type-2 merge (SURVEY §2.11 north star:
the dimension-history operator every warehouse ingest eventually
needs; the reference's upsert, src/database.py:133-202, is SCD Type-1
— new attribute values OVERWRITE, history is lost. Type-2 keeps it).

``scd2_merge`` applies one batch of attribute updates to a versioned
dimension: rows carry ``eff_from`` / ``eff_to`` / ``is_current``; an
update whose tracked attributes differ from the key's current version
closes that version (``eff_to`` = batch timestamp) and opens a new
current one; identical updates are no-ops; unseen keys insert as new
current rows. History rows are NEVER rewritten.

Spark-first shape and scale:
- ONE full-outer join on the business key between the current slice
  and the (latest-per-key) update batch — a single hash shuffle, AQE
  skew-safe, broadcast when the update batch is small (the common
  incremental case: Spark's size estimate picks the broadcast side
  automatically; no hint needed, no collect anywhere).
- history rows bypass the join entirely (``is_current`` partition
  filter), so cost tracks |current| + |updates|, not table history.
- change detection is a null-safe column comparison (``eqNullSafe``)
  folded into one boolean — JVM-side, codegen'd, no UDF.
- with a transactional format this is ``MERGE INTO ... WHEN MATCHED
  AND <changed> THEN UPDATE ... WHEN NOT MATCHED THEN INSERT`` plus an
  insert of the new versions; the DataFrame formulation here is the
  format-agnostic equivalent with identical semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_update_per_key(
    updates: DataFrame, key_cols: list[str], ts_col: str
) -> DataFrame:
    """Collapse an update batch to one row per key (latest by ``ts_col``,
    ties broken arbitrarily-but-deterministically by the remaining
    columns): applying two versions of a key from ONE batch is
    order-undefined, so SCD2 semantics require the collapse first."""
    others = [c for c in updates.columns if c not in key_cols]
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), *[F.col(c).desc() for c in others if c != ts_col]
    )
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _changed(tracked_cols: list[str]) -> Column:
    out = F.lit(False)
    for c in tracked_cols:
        out = out | ~F.col(f"c.{c}").eqNullSafe(F.col(f"u.{c}"))
    return out


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    batch_ts: Column,
    eff_from: str = "eff_from",
    eff_to: str = "eff_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Merge one update batch into a versioned dimension.

    ``dim`` columns: key_cols + tracked_cols + eff_from/eff_to/current.
    ``updates`` columns: key_cols + tracked_cols (already collapsed to
    one row per key — see :func:`latest_update_per_key`).
    ``batch_ts``: the effective timestamp of this batch (a literal
    column; becomes ``eff_to`` of closed versions and ``eff_from`` of
    opened ones).

    Returns the NEW full dimension (history ∪ merged current slice).
    """
    history = dim.filter(~F.col(current_col))
    current = dim.filter(F.col(current_col))

    # presence markers survive NULL tracked values on real rows: anchor
    # the update side on an injected literal, the current side on its
    # (always-true) flag column
    j = current.alias("c").join(
        updates.withColumn("__upd", F.lit(True)).alias("u"),
        on=key_cols,
        how="full_outer",
    )
    has_cur = F.col(f"c.{current_col}").isNotNull()
    has_upd = F.col("u.__upd").isNotNull()
    changed = has_cur & has_upd & _changed(tracked_cols)

    # surviving current rows: unchanged keys (no update, or identical)
    keep_current = j.filter(has_cur & (~has_upd | ~_changed(tracked_cols))).select(
        *key_cols,
        *[F.col(f"c.{c}").alias(c) for c in tracked_cols],
        F.col(f"c.{eff_from}").alias(eff_from),
        F.col(f"c.{eff_to}").alias(eff_to),
        F.col(f"c.{current_col}").alias(current_col),
    )
    # closed-out versions of changed keys
    closed = j.filter(changed).select(
        *key_cols,
        *[F.col(f"c.{c}").alias(c) for c in tracked_cols],
        F.col(f"c.{eff_from}").alias(eff_from),
        batch_ts.alias(eff_to),
        F.lit(False).alias(current_col),
    )
    # newly-opened versions: changed keys + brand-new keys
    opened = j.filter(has_upd & (~has_cur | _changed(tracked_cols))).select(
        *key_cols,
        *[F.col(f"u.{c}").alias(c) for c in tracked_cols],
        batch_ts.alias(eff_from),
        F.lit(None).cast(dim.schema[eff_to].dataType).alias(eff_to),
        F.lit(True).alias(current_col),
    )
    return history.select(*keep_current.columns).unionByName(
        keep_current
    ).unionByName(closed).unionByName(opened)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """CDC extract between two table snapshots: one row per changed key
    with ``change_type`` ∈ insert/update/delete, old values under
    ``old_<col>`` and new under ``new_<col>``.

    The reference's change detection (src/pipeline.py early-exit probe)
    only answers "are there NEW rows?"; a warehouse sync needs the full
    three-way delta. Same scale shape as :func:`scd2_merge`: ONE
    full-outer hash join on the key (broadcast when one snapshot is
    small), null-safe compares JVM-side, unchanged keys dropped before
    anything materializes. Keys must be unique per snapshot.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in key_cols]
    j = old.withColumn("__old", F.lit(True)).alias("o").join(
        new.withColumn("__new", F.lit(True)).alias("n"),
        on=key_cols,
        how="full_outer",
    )
    has_old = F.col("o.__old").isNotNull()
    has_new = F.col("n.__new").isNotNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change = (
        F.when(has_old & ~has_new, F.lit("delete"))
        .when(~has_old & has_new, F.lit("insert"))
        .when(~same, F.lit("update"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *key_cols,
            "change_type",
            *[F.col(f"o.{c}").alias(f"old_{c}") for c in compare_cols],
            *[F.col(f"n.{c}").alias(f"new_{c}") for c in compare_cols],
        )
    )


def dimension_as_of(dim: DataFrame, at: Column, eff_from: str = "eff_from",
                    eff_to: str = "eff_to") -> DataFrame:
    """Point-in-time reconstruction of a versioned dimension: the rows
    whose validity interval covers ``at`` — ``eff_from <= at < eff_to``
    (open current versions have NULL ``eff_to``). Time travel as a
    filter: at scale this predicate partition-prunes when the dimension
    is laid out by eff_from (e.g. scd_sync's batch dirs), so "the
    dimension as of last quarter" never scans versions born later.
    Returns the version columns minus the bookkeeping flags untouched —
    callers project what they need.
    """
    return dim.filter(
        (F.col(eff_from).isNull() | (F.col(eff_from) <= at))
        & (F.col(eff_to).isNull() | (F.col(eff_to) > at))
    )


def apply_cdc_log(
    base: DataFrame,
    log: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Replay an ordered change-data-capture log onto a base snapshot:
    the final state keeps, per key, the payload of the HIGHEST-sequence
    operation ('I'/'U' upsert wins, 'D' removes the key), with base
    rows acting as sequence −∞ inserts. The inverse of
    :func:`snapshot_diff`: replaying a diff's new-side payloads
    (insert/update → 'U', delete → 'D') onto the old snapshot
    reconstructs the new one exactly, for any two snapshots.

    Scale shape: one union (no shuffle) + one top-1-per-key window —
    a single hash shuffle on the business key, the same cost as the
    upsert dedup it generalizes (operators/upsert.py). Log rows for
    one key land in one partition regardless of log length, and AQE
    handles hot keys; nothing collects. With a transactional format
    this is the engine-side of `MERGE` fed by a CDC stream (Debezium /
    Delta CDF shape: op ∈ {I, U, D} + a total-order sequence).
    """
    payload = [c for c in base.columns if c not in key_cols]
    missing = set(key_cols + payload + [seq_col, op_col]) - set(log.columns)
    if missing:
        raise ValueError(f"log is missing columns: {sorted(missing)}")
    # Base rows tag with the true sequence −∞ (Long.MIN_VALUE) plus a
    # source rank below every log row, so ANY log sequence — including
    # negative ones — deterministically beats the base snapshot. Ties
    # WITHIN the log (two ops sharing a seq for one key) are a contract
    # violation (seq must totally order ops per key); the source tag
    # cannot disambiguate those.
    base_tagged = base.select(
        *key_cols,
        *payload,
        F.lit(-(2**63)).cast("long").alias("__seq"),
        F.lit(0).alias("__src"),
        F.lit("I").alias("__op"),
    )
    log_tagged = log.select(
        *key_cols,
        *payload,
        F.col(seq_col).cast("long").alias("__seq"),
        F.lit(1).alias("__src"),
        F.col(op_col).alias("__op"),
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("__seq").desc(), F.col("__src").desc()
    )
    return (
        base_tagged.unionByName(log_tagged)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("__op") != F.lit("D")))
        .drop("__rn", "__seq", "__src", "__op")
    )
