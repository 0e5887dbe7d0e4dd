"""As-of (backward) join — match each left row to the most recent right row
at or before its timestamp, per key.

Not in the reference (SURVEY.md §2.3 J11 "none present") but a staple of
event/feature pipelines, so the engine ships it as a first-class operator.

Implementation is the scalable union+window trick, NOT a range cross join:
tag both sides, union, sort within key by (ts, right-before-left), carry the
last right row forward with last(ignorenulls) over an unbounded-preceding
frame, keep left rows. One shuffle on the key — cost O(n log n) per key
group, immune to the range-join blowup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Left rows + ``asof_<c>`` for each right value column (NULL if no
    right row at-or-before the left timestamp).

    Ties: a right row with ts equal to the left row's ts matches (inclusive
    as-of). ``tiebreak`` orders right rows sharing a timestamp.
    """
    lcols = left.columns
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__rv_{c}") for c in value_cols],
        (F.lit(None).cast("long") if tiebreak is None else F.lit(None).cast(right.schema[tiebreak].dataType)).alias("__tb"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__rv_{c}") for c in value_cols],
        (F.lit(None).cast("long") if tiebreak is None else F.col(tiebreak)).alias("__tb"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # Right rows sort before left rows at the same ts (inclusive as-of);
    # among right rows at the same ts the tiebreak decides.
    w = (
        Window.partitionBy("__k")
        .orderBy(
            F.col("__ts").asc(),
            F.col("__is_left").asc(),
            F.col("__tb").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__is_left",
        *lcols,
        *[
            F.last(F.col(f"__rv_{c}"), ignorenulls=True)
            .over(w)
            .alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return carried.where(F.col("__is_left") == 1).drop("__is_left")
