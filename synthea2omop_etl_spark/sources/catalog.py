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
write-temp + hard-link CAS the table layer uses. A crash mid-protocol
leaves orphan table versions and no new catalog — retry simply commits
again; ``vacuum_catalog`` reclaims the orphans WITHOUT breaking older
snapshots (it pins every table version any catalog manifest references —
per-table ``versioned.vacuum`` must not run on catalog-managed tables).
This is exactly Iceberg's table-metadata/catalog split, one level up.
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


_RESERVED_KEYS = ("version", "tables", "rolled_back_to")


def _publish_catalog(root: str, manifest: dict) -> None:
    """Catalog manifests claim their slot through the SAME hard-link CAS
    as table manifests — one protocol, one place to port to an object
    store's conditional PUT."""
    V.atomic_claim(
        _cat_manifest_path(root, manifest["version"]),
        manifest,
        "catalog version",
    )


def commit_catalog(
    root: str,
    tables: dict[str, DataFrame],
    mode: str = "overwrite",
    extra: dict | None = None,
) -> int:
    """Commit every table then publish one catalog version pinning them.

    Unchanged tables may be omitted: the new catalog carries forward the
    previous catalog's pin for any table not in ``tables``. ``extra`` may
    not contain the reserved manifest keys (version/tables/rolled_back_to)
    — silently overwriting the pin map would corrupt the snapshot.
    """
    if extra:
        for k in _RESERVED_KEYS:
            if k in extra:
                raise ValueError(
                    f"extra may not override catalog manifest key {k!r}"
                )
    versions = list_catalog_versions(root)
    pins: dict[str, int] = {}
    if versions:
        pins.update(read_catalog_manifest(root, versions[-1])["tables"])
    for name, df in sorted(tables.items()):
        pins[name] = V.commit_version(
            df, os.path.join(root, name), mode=mode
        )
    cat_version = (versions[-1] + 1) if versions else 0
    manifest = {"version": cat_version, "tables": pins}
    if extra:
        manifest.update(extra)
    _publish_catalog(root, manifest)
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
    _publish_catalog(
        root,
        {
            "version": version,
            "rolled_back_to": to_version,
            "tables": old["tables"],
        },
    )
    return version


def vacuum_catalog(
    root: str,
    keep_catalog_versions: int = 2,
    keep_table_versions: int = 1,
    min_age_seconds: float = 3600.0,
) -> list[str]:
    """Reclaim storage across a catalog WITHOUT breaking any surviving
    snapshot: drop catalog manifests older than ``keep_catalog_versions``,
    then vacuum each table with every still-referenced pin PROTECTED —
    a pin carried forward across many catalog versions stays readable no
    matter how old its table version number is. This is the ONLY safe
    vacuum for catalog-managed tables (see versioned.vacuum). Returns all
    removed data files.

    Table directories under the root that NO surviving catalog manifest
    pins (a crashed commit_catalog's new table, or a table dropped from
    recent snapshots) are vacuumed too — their versions are orphans that
    would otherwise accumulate forever. ``min_age_seconds`` (the
    versioned.vacuum in-flight grace window) keeps a commit racing this
    vacuum safe."""
    versions = list_catalog_versions(root)
    if not versions:
        return []
    keep = versions[-keep_catalog_versions:] if keep_catalog_versions >= 1 else versions
    for v in versions:
        if v not in keep:
            os.remove(_cat_manifest_path(root, v))
    pinned: dict[str, set[int]] = {}
    for v in keep:
        for name, tv in read_catalog_manifest(root, v)["tables"].items():
            pinned.setdefault(name, set()).add(tv)
    table_dirs = sorted(
        e
        for e in os.listdir(root)
        if os.path.isdir(os.path.join(root, e)) and e != _CATALOG
    )
    removed: list[str] = []
    for name in table_dirs:
        removed.extend(
            V.vacuum(
                os.path.join(root, name),
                keep_versions=keep_table_versions,
                protect=sorted(pinned.get(name, ())),
                min_age_seconds=min_age_seconds,
            )
        )
    return removed
