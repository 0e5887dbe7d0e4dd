"""Post-ETL validation suite — the reference's 5 weighted checks
(etl_pipeline/etl_validation.py:54-537) as DataFrame assertions.

Checks: (1) record counts non-zero; (2) referential integrity (FK orphans
via left-join-is-null); (3) date ranges (end ≥ start, no future dates);
(4) demographics (valid gender concepts, plausible birth years);
(5) concept-mapping completeness (>20% unmapped ⇒ FAIL).

Each check returns (name, passed, weight, details); ``validate`` aggregates
a weighted score and a JSON-able report, like the reference's report writer
(etl_validation.py:499-537).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Check = tuple[str, bool, float, dict[str, Any]]


def check_record_counts(tables: dict[str, DataFrame]) -> Check:
    counts = {name: df.count() for name, df in tables.items()}
    empty = [n for n, c in counts.items() if c == 0]
    return ("record_counts", not empty, 0.2, {"counts": counts, "empty": empty})


def check_referential_integrity(
    facts: dict[str, tuple[DataFrame, str]],
    dim: DataFrame,
    id_col: str = "person_id",
    name: str = "referential_integrity",
    weight: float = 0.3,
) -> Check:
    """facts: {table: (df, fk_col)}; orphans = non-NULL FK not in ``dim``.

    NULL FKs are not orphans — left-joined links (visit without an
    encounter, visit without a provider) legitimately carry NULL.
    """
    orphans = {}
    dim_ids = dim.select(id_col)
    for fact_name, (df, fk) in facts.items():
        n = (
            df.where(F.col(fk).isNotNull())
            .join(dim_ids, df[fk] == dim_ids[id_col], "left_anti")
            .count()
        )
        orphans[fact_name] = n
    ok = all(v == 0 for v in orphans.values())
    return (name, ok, weight, {"orphans": orphans})


def check_date_ranges(
    ranged: dict[str, tuple[DataFrame, str, str]]
) -> Check:
    """ranged: {table: (df, start_col, end_col)} — end ≥ start, no future."""
    bad = {}
    for name, (df, start, end) in ranged.items():
        n_reversed = df.where(F.col(end) < F.col(start)).count()
        n_future = df.where(F.col(start) > F.current_date()).count()
        bad[name] = {"end_before_start": n_reversed, "future": n_future}
    ok = all(v["end_before_start"] == 0 and v["future"] == 0 for v in bad.values())
    return ("date_ranges", ok, 0.2, bad)


def check_demographics(person: DataFrame) -> Check:
    n = person.count()
    bad_gender = person.where(
        ~F.col("gender_concept_id").isin(8507, 8532)
    ).count()
    bad_birth = person.where(
        (F.col("year_of_birth") < 1900)
        | (F.col("year_of_birth") > F.year(F.current_date()))
    ).count()
    ok = n > 0 and bad_gender == 0 and bad_birth == 0
    return (
        "demographics",
        ok,
        0.15,
        {"persons": n, "invalid_gender": bad_gender, "invalid_birth_year": bad_birth},
    )


def check_mapping_completeness(
    mapped: dict[str, tuple[DataFrame, str]], threshold: float = 0.2
) -> Check:
    """mapped: {table: (df, concept_id_col)} — fraction of concept_id==0."""
    stats = {}
    for name, (df, col) in mapped.items():
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col(col) == 0, 1).otherwise(0)).alias("unmapped"),
        ).collect()[0]
        frac = (agg.unmapped or 0) / agg.n if agg.n else 0.0
        stats[name] = {"rows": agg.n, "unmapped": agg.unmapped, "fraction": round(frac, 4)}
    ok = all(v["fraction"] <= threshold for v in stats.values())
    return ("mapping_completeness", ok, 0.15, stats)


def dqd_results(checks: list[Check], spark=None) -> DataFrame:
    """Render validation checks in the reference's
    ``dataqualitydashboard_results`` shape (issue_id, issue_description,
    prevalence, record_count, failed — query_achilles_results.sh:236-239),
    so a dashboard built against the reference reads this table unchanged.

    prevalence: the failing fraction where a check reports one (mapping
    completeness), else 0/1 by pass state; record_count: the failing row
    count the check counted, where available.
    """
    import json as _json

    rows = []
    for issue_id, (name, ok, _w, details) in enumerate(checks, start=1):
        record_count = 0
        prevalence = 0.0 if ok else 1.0
        if name == "referential_integrity":
            record_count = sum(details.get("orphans", {}).values())
        elif name == "date_ranges":
            record_count = sum(
                v["end_before_start"] + v["future"] for v in details.values()
            )
        elif name == "demographics":
            record_count = details.get("invalid_gender", 0) + details.get(
                "invalid_birth_year", 0
            )
        elif name == "mapping_completeness":
            record_count = sum(
                v.get("unmapped") or 0 for v in details.values()
            )
            fracs = [v["fraction"] for v in details.values()]
            prevalence = round(max(fracs), 4) if fracs else 0.0
        rows.append(
            (
                issue_id,
                f"{name}: {_json.dumps(details, default=str)[:200]}",
                float(prevalence),
                int(record_count),
                not ok,
            )
        )
    if spark is None:
        from synthea2omop_etl_spark.session import get_spark

        spark = get_spark()
    return spark.createDataFrame(
        rows,
        "issue_id int, issue_description string, prevalence double, "
        "record_count bigint, failed boolean",
    )


def validate(checks: list[Check]) -> dict[str, Any]:
    score = sum(w for _, ok, w, _ in checks if ok)
    total = sum(w for _, _, w, _ in checks)
    return {
        "passed": all(ok for _, ok, _, _ in checks),
        "score": round(score / total, 4) if total else 1.0,
        "checks": {
            name: {"passed": ok, "weight": w, "details": d}
            for name, ok, w, d in checks
        },
    }
