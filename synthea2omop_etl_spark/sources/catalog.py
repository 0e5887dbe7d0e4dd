"""Atomic multi-table catalog snapshots over versioned tables.

The OMOP output is 16 interdependent tables (person ← visit ← condition
…); per-table versioning alone lets a reader see person@v5 joined with
visit@v4 — referentially broken mid-publish. A catalog snapshot pins ONE
version per table in a single atomically-published manifest, so every
reader resolves a mutually consistent set:

    catalog/
      _catalog/v{N}.json     {"tables": {"omop_person": 3, ...}}
      omop_person/           a sources/versioned.py table
      omop_visit_occurrence/ ...

Commit protocol (write-ahead, reader-invisible until the end): commit
each table's new version first (readers of catalog v{N-1} still resolve
the OLD versions — new table versions are unreferenced until the catalog
manifest lands), then publish the catalog manifest via the same
write-temp + atomic rename. A crash mid-protocol leaves orphan table
versions and no new catalog — retry simply commits again; vacuum reclaims
the orphans. This is exactly Iceberg's table-metadata/catalog split, one
level up.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from synthea2omop_etl_spark.sources import versioned as V

_CATALOG = "_catalog"


def _cat_manifest_path(root: str, version: int) -> str:
    return os.path.join(root, _CATALOG, f"v{version}.json")


def list_catalog_versions(root: str) -> list[int]:
    d = os.path.join(root, _CATALOG)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[1:-5])
        for f in os.listdir(d)
        if f.startswith("v") and f.endswith(".json")
    )


def read_catalog_manifest(root: str, version: int) -> dict:
    with open(_cat_manifest_path(root, version)) as fh:
        return json.load(fh)


def commit_catalog(
    root: str,
    tables: dict[str, DataFrame],
    mode: str = "overwrite",
    extra: dict | None = None,
) -> int:
    """Commit every table then publish one catalog version pinning them.

    Unchanged tables may be omitted: the new catalog carries forward the
    previous catalog's pin for any table not in ``tables``.
    """
    versions = list_catalog_versions(root)
    pins: dict[str, int] = {}
    if versions:
        pins.update(read_catalog_manifest(root, versions[-1])["tables"])
    for name, df in sorted(tables.items()):
        pins[name] = V.commit_version(
            df, os.path.join(root, name), mode=mode
        )
    cat_version = (versions[-1] + 1) if versions else 0
    target = _cat_manifest_path(root, cat_version)
    os.makedirs(os.path.dirname(target), exist_ok=True)
    if os.path.exists(target):
        raise ValueError(
            f"catalog version {cat_version} already committed — "
            "concurrent writer? (single-writer contract)"
        )
    manifest = {"version": cat_version, "tables": pins}
    if extra:
        manifest.update(extra)
    tmp = target + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.rename(tmp, target)
    return cat_version


def read_catalog(
    spark: SparkSession, root: str, version: int | None = None
) -> dict[str, DataFrame]:
    """Every table at its pinned version — one mutually consistent
    snapshot, regardless of commits landing while the caller works."""
    versions = list_catalog_versions(root)
    if not versions:
        raise ValueError(f"no catalog versions at {root}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"catalog version {version} not in {versions}")
    pins = read_catalog_manifest(root, version)["tables"]
    return {
        name: V.read_version(spark, os.path.join(root, name), v)
        for name, v in sorted(pins.items())
    }


def rollback_catalog(root: str, to_version: int) -> int:
    """Publish a new catalog version with ``to_version``'s pins —
    every table rolls back in ONE atomic step (metadata only)."""
    old = read_catalog_manifest(root, to_version)
    version = list_catalog_versions(root)[-1] + 1
    target = _cat_manifest_path(root, version)
    tmp = target + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {
                "version": version,
                "rolled_back_to": to_version,
                "tables": old["tables"],
            },
            fh, indent=1, sort_keys=True,
        )
    os.rename(tmp, target)
    return version
