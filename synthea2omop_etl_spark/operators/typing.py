"""Cast-or-null typing operators (SURVEY.md §2.2 P1-P3, P7).

The engine's core typing semantic, matching the reference's regex-guarded
casts (sql/synthea_typing/synthea-typedtables-transformation.sql:34-60):
**invalid values become NULL, never errors**.

All expressions are built from pyspark.sql.functions — JVM-side, inside
whole-stage codegen; no Python UDFs in the typing path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The reference uses three inconsistent numeric regexes
# (SURVEY.md §2.2 P2); the engine standardizes on the signed
# scientific-notation variant (sql/etl/migrate_numeric_observations_v3.sql:313).
NUMERIC_RE = r"^[-]?[0-9]+([.][0-9]+)?([eE][-+]?[0-9]+)?$"
# Unsigned variant used by the raw typing layer (typing sql:253).
UNSIGNED_NUMERIC_RE = r"^[0-9]+([.][0-9]+)?$"
# Signed variant for coordinates (typing sql:594-595, LAT/LON).
SIGNED_NUMERIC_RE = r"^-?[0-9]+([.][0-9]+)?$"
# Unsigned integer guard (typing sql:668 DISPENSES, :797 UNIQUE_CUSTOMERS).
UNSIGNED_INT_RE = r"^[0-9]+$"
# Timestamp prefix guard (typing sql:34-35).
TIMESTAMP_RE = r"^\d{4}-\d{2}-\d{2}"
# UUID shape guard (typing sql:36-37). Postgres's was loose
# ('^[0-9a-fA-F-]{36}$'); we keep the loose form for parity.
UUID_RE = r"^[0-9a-fA-F-]{36}$"

_GUARDS = {
    "double": NUMERIC_RE,
    "decimal": NUMERIC_RE,
    "int": r"^[-]?[0-9]+$",
    "bigint": r"^[-]?[0-9]+$",
    "timestamp": TIMESTAMP_RE,
    "date": TIMESTAMP_RE,
}


def cast_or_null(col: Column | str, dtype: str, regex: str | None = None) -> Column:
    """``CASE WHEN col ~ regex THEN col::T ELSE NULL END``.

    ``regex`` defaults to the guard appropriate for ``dtype``. With ANSI off
    Spark's cast already returns NULL on garbage, but the explicit guard (a)
    matches the reference's semantics exactly — e.g. '12abc' must be NULL,
    not a partial parse — and (b) documents intent in the plan.
    """
    c = F.col(col) if isinstance(col, str) else col
    guard = regex or _GUARDS.get(dtype.split("(")[0].lower())
    if dtype.lower() == "date":
        typed = F.to_date(F.substring(c, 1, 10))
    elif dtype.lower() == "timestamp":
        typed = F.to_timestamp(c)
    else:
        typed = c.cast(dtype)
    if guard is None:
        return typed
    return F.when(c.rlike(guard), typed)


def enum_or_null(col: Column | str, allowed: Sequence[str]) -> Column:
    """Postgres-ENUM parity: value kept only if in the allowed set (P3)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isin(list(allowed)), c)


def null_if_empty(col: Column | str) -> Column:
    """``CASE WHEN x IS NULL OR x = '' THEN NULL ELSE x END`` (P7)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull() | (c == F.lit("")), F.lit(None)).otherwise(c)


def apply_typing(df: DataFrame, spec: dict[str, tuple[str, object]]) -> DataFrame:
    """Type a raw all-string DataFrame per ``spec``: {col: (dtype, guard)}.

    ``guard`` is a regex (or None for the dtype default); for
    ``dtype == "enum"`` it is the allowed-value sequence (Postgres-ENUM
    parity: anything outside the set becomes NULL).

    One select (single projection, codegen-friendly) rather than chained
    withColumn calls. Columns absent from the spec pass through unchanged.
    """
    cols = []
    for name in df.columns:
        if name in spec:
            dtype, guard = spec[name]
            if dtype == "enum":
                cols.append(enum_or_null(name, guard).alias(name))
            else:
                cols.append(cast_or_null(name, dtype, guard).alias(name))
        else:
            cols.append(F.col(name))
    return df.select(*cols)
