"""Dedupe operators (SURVEY.md §2.3 J3, J9; §2.5 W1).

- ``anti_join_new_rows`` — NOT EXISTS semantics (left_anti), the reference's
  idempotent re-run dedupe (etl_pipeline/etl_conditions.py:193-202).
- ``first_per_group`` — Postgres ``DISTINCT ON (k) ... ORDER BY k, o`` as
  ``row_number().over(partitionBy(k).orderBy(o)) == 1``
  (sql/etl/populate_concept_map_v2.sql:17-33).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def anti_join_new_rows(
    incoming: DataFrame, existing: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Rows of ``incoming`` whose key tuple is absent from ``existing``.

    left_anti == NOT EXISTS: a NULL key in ``existing`` never suppresses
    incoming rows (unlike NOT IN — SURVEY.md §2.3 J3 null-semantics note).
    """
    return incoming.join(
        existing.select(*keys).distinct(), on=list(keys), how="left_anti"
    )


def first_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """DISTINCT ON: keep the first row per group under a total order.

    Callers must make ``order_by`` a total order within the group (append a
    unique tiebreaker) for deterministic results — the reference relies on
    Postgres's ORDER BY the same way.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
