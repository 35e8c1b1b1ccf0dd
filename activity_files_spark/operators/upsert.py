"""MERGE INTO / upsert (Iceberg-style) as engine-native DataFrame plans.

The reference engine is file-per-activity and has no table maintenance; a
100 TB lake pipeline needs MERGE semantics for incremental re-ingest
(re-parsed activities, corrected tracks, dedup re-runs). This implements
the copy-on-write MERGE shape: one equi-join shuffle on the merge keys —
exactly the plan Iceberg/Delta execute when rewriting matched files — so
swapping the sink for a real Iceberg catalog changes the writer, not the
plan. Pair with plans/manifest.py for idempotent resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    when_matched: str = "update",
) -> DataFrame:
    """MERGE source INTO target ON keys.

    ``when_matched='update'``: matched target rows are replaced by the
    source row (whole-row update), unmatched source rows are inserted,
    unmatched target rows are kept — `anti-join(target) ∪ source`, a
    single shuffle.
    ``when_matched='ignore'``: insert-only (first-writer-wins) —
    `target ∪ anti-join(source)`.

    The source must be unique on ``keys`` (dedupe upstream with
    normalize.sort_dedup — last-wins — if it is not); both sides must
    share the target schema.
    """
    if when_matched == "update":
        kept = target.join(source.select(*keys), keys, "left_anti")
        return kept.unionByName(source)
    if when_matched == "ignore":
        new_rows = source.join(target.select(*keys), keys, "left_anti")
        return target.unionByName(new_rows)
    raise ValueError(f"when_matched must be 'update' or 'ignore', got {when_matched!r}")
