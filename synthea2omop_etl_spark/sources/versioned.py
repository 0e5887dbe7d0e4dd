"""Manifest-based versioned parquet layer: time travel, rollback, vacuum.

The reference's history story is "re-run the INSERT..SELECT and hope"
(etl_pipeline/etl_setup.py:230-279 resume semantics); a 100 TB lake needs
table versions that are (a) atomic to readers, (b) O(changed-files) to
commit, (c) reconstructable after a bad load. This is the minimal
Delta/Iceberg-shaped core, built on nothing but parquet + JSON manifests:

- ``table/_manifests/v{N}.json`` lists the data files that ARE version N.
  Readers never list data directories (listing is the scalability trap on
  object stores — eventual consistency + O(files) round trips); they read
  one small manifest and hand Spark an explicit file list.
- A commit writes new files under ``table/data/v{N}/`` then publishes the
  manifest via write-temp + atomic rename. Readers see the old version
  until the rename lands — snapshot isolation for free.
- ``append`` commits reference the parent's files plus the new ones —
  O(new files) metadata, no rewrite. ``overwrite`` references only the
  new files; the old data stays on disk until ``vacuum``, which is what
  makes ``rollback`` a metadata-only operation (publish a manifest that
  points at the old file set).

Multi-writer safe: data files land in a per-commit UNIQUE directory (no
two writers ever touch the same path), and the version number is claimed
by a compare-and-swap on the manifest file (``os.link`` fails atomically
if the slot is taken — the filesystem is the log store, exactly the
position Delta's LogStore occupies). A loser re-probes the next version
and re-claims WITHOUT rewriting data: the retry is O(1) metadata. On
object stores swap the hard-link claim for a conditional PUT
(If-None-Match) — the manifest format does not change.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

_MANIFESTS = "_manifests"
_DATA = "data"


class VersionConflictError(ValueError):
    """Another writer claimed this version number first."""


def _manifest_path(table_path: str, version: int) -> str:
    return os.path.join(table_path, _MANIFESTS, f"v{version}.json")


def list_versions(table_path: str) -> list[int]:
    mdir = os.path.join(table_path, _MANIFESTS)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json"):
            out.append(int(f[1:-5]))
    return sorted(out)


def read_manifest(table_path: str, version: int) -> dict:
    with open(_manifest_path(table_path, version)) as fh:
        return json.load(fh)


def atomic_claim(target: str, payload: dict, what: str = "version") -> None:
    """Atomically claim a manifest slot at ``target``.

    Write-temp + hard-link: ``os.link`` fails with FileExistsError when the
    target exists, so exactly one of N racing writers wins the slot — a
    true compare-and-swap, unlike ``os.rename`` which silently REPLACES an
    existing target on POSIX. Readers see the old version or the complete
    new one, never a half-written file. On object stores swap the link
    for a conditional PUT (If-None-Match); this helper is the single
    place to do it — table manifests (here) and catalog manifests
    (sources/catalog.py) both claim through it."""
    os.makedirs(os.path.dirname(target), exist_ok=True)
    conflict = VersionConflictError(
        f"{what} {payload.get('version')} already committed — "
        "concurrent writer won this slot"
    )
    if os.path.exists(target):
        raise conflict
    tmp = target + f".{uuid.uuid4().hex}.tmp"  # unique: losers never clobber
    with open(tmp, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    try:
        os.link(tmp, target)
    except FileExistsError:
        raise conflict from None
    finally:
        os.unlink(tmp)


def _publish(table_path: str, manifest: dict) -> None:
    atomic_claim(
        _manifest_path(table_path, manifest["version"]), manifest, "version"
    )


def _data_files(path: str) -> list[str]:
    return sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )


class ExpectationError(ValueError):
    """A commit-time expectation failed; nothing was published."""


def check_expectations(
    df: DataFrame, expectations: dict[str, str]
) -> dict[str, int]:
    """Count violations of each named boolean-SQL expectation in ONE scan
    (conditional sums, map-side combinable). Returns {name: n_violations}.

    A row violates when the condition is not TRUE — NULL counts as a
    violation (three-valued logic would otherwise let NULLs slip through
    a BETWEEN/comparison check unseen)."""
    from pyspark.sql import functions as F

    aggs = [
        F.sum(
            F.when(F.coalesce(F.expr(cond), F.lit(False)), 0).otherwise(1)
        ).alias(name)
        for name, cond in expectations.items()
    ]
    row = df.agg(*aggs).collect()[0]
    return {name: int(row[name] or 0) for name in expectations}


def _footer_stats(files: list[str], cols: Sequence[str]) -> dict:
    """Per-file min/max for ``cols`` from parquet footers (no data read).

    Stats are converted to a JSON type that preserves the column's ORDER
    before row-group merging: Decimal → float, date/datetime → ISO-8601
    string (lexicographic == chronological). A bare str() would merge
    decimals lexicographically — min('9.5','10.2') = '10.2' — recording a
    falsely narrow range that makes prune() silently drop matching files.
    Types with no order-preserving JSON form (raw bytes) record no stats
    for that column, so pruning stays conservative."""
    import datetime
    import decimal

    import pyarrow.parquet as pq

    def _plain(v):
        if isinstance(v, bool) or v is None:
            return v
        if isinstance(v, (int, float, str)):
            return v
        if isinstance(v, decimal.Decimal):
            return float(v)
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        return NotImplemented  # bytes etc.: unorderable as JSON — skip

    out: dict[str, dict] = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        per_col: dict[str, list] = {}
        for rg_i in range(md.num_row_groups):
            rg = md.row_group(rg_i)
            for c_i in range(rg.num_columns):
                col = rg.column(c_i)
                name = col.path_in_schema
                if name not in cols:
                    continue
                try:
                    s = col.statistics
                    if s is None or not s.has_min_max:
                        continue
                    lo, hi = _plain(s.min), _plain(s.max)
                except Exception:
                    # pyarrow can't surface stats for every physical type
                    # (decimal raises ArrowNotImplementedError on .min):
                    # record nothing — prune() conservatively keeps the file.
                    continue
                if lo is NotImplemented or hi is NotImplemented:
                    continue
                if name in per_col:
                    per_col[name] = [
                        min(per_col[name][0], lo), max(per_col[name][1], hi)
                    ]
                else:
                    per_col[name] = [lo, hi]
        out[f] = per_col
    return out


def _bloom_positions_py(value, m_bits: int, k: int) -> list[int]:
    """Python twin of operators/sketches._bloom_positions (salted md5
    mod-P mod m) — build and probe agree by construction."""
    import hashlib

    P = 2_147_483_647
    out = []
    for i in range(1, k + 1):
        h = int(
            hashlib.md5(f"{value}|{i}".encode()).hexdigest()[:15], 16
        ) % P
        out.append(h % m_bits)
    return out


def _file_blooms(
    files: list[str], cols: Sequence[str], m_bits: int, k: int
) -> dict:
    """Per-file bloom bitmaps for ``cols``: {file: {col: b64(bitmap)}}.

    Unlike footer stats this reads the indexed COLUMNS (projected — never
    the whole file), once, at commit, for the NEW files only — the
    standard price of a point-lookup index (Delta/Iceberg bloom indexes
    pay the same). NULLs are not indexed."""
    import base64

    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    want = [c for c in cols]
    for f in files:
        pf = pq.ParquetFile(f)
        present = [c for c in want if c in pf.schema_arrow.names]
        if not present:
            continue
        table = pf.read(columns=present)
        per_col: dict[str, str] = {}
        for c in present:
            bits = bytearray(m_bits // 8)
            for v in table.column(c).unique().to_pylist():
                if v is None:
                    continue
                for pos in _bloom_positions_py(v, m_bits, k):
                    bits[pos >> 3] |= 1 << (pos & 7)
            per_col[c] = base64.b64encode(bytes(bits)).decode("ascii")
        out[f] = per_col
    return out


def commit_version(
    df: DataFrame, table_path: str, mode: str = "append",
    extra: dict | None = None,
    expectations: dict[str, str] | None = None,
    stats_cols: Sequence[str] | None = None,
    bloom_cols: Sequence[str] | None = None,
    bloom_bits: int = 8192,
    bloom_k: int = 3,
) -> int:
    """Write ``df`` as the next table version; returns the version number.

    ``append``: new version = parent's file set + the files just written.
    ``overwrite``: new version = just the files written (old files remain
    for time travel until vacuumed). ``extra`` merges additional metadata
    into the manifest (e.g. a streaming batch id for replay guards).

    ``expectations`` maps names to boolean SQL over the incoming batch
    (e.g. ``{"pk_not_null": "id IS NOT NULL"}``): any violation raises
    ExpectationError BEFORE the manifest publish — readers never see a
    version that failed its contract. The check is one extra scan of the
    incoming data only (never the whole table), and the passing counts
    are recorded in the manifest as the version's audit trail.

    ``stats_cols`` records per-file min/max for those columns in the
    manifest (parquet footers only — zero data read): the Iceberg-style
    manifest-pruning index ``read_version(prune=...)`` consults to skip
    whole files before Spark ever sees them. On ``append``, the parent's
    recorded stats carry over, so the index stays complete across
    incremental commits.

    ``bloom_cols`` additionally records a per-file BLOOM bitmap
    (``bloom_bits`` bits, ``bloom_k`` salted hashes — 1 KB/file/column at
    the default) for point-lookup skipping on columns min/max can't prune
    (high-cardinality ids, uuids): ``read_version(prune_eq=(col, value))``
    drops files whose bitmap proves the value absent. Building reads the
    indexed columns of the NEW files once at commit (projected scan — the
    same price Delta/Iceberg bloom indexes pay); like stats, parent
    bitmaps carry over on append.

    Concurrency: data files are written ONCE into a per-commit unique
    directory (no writer ever touches another's files), then the version
    number is claimed by manifest CAS. A writer that loses the race
    re-probes the latest version and re-claims — O(1) metadata retries,
    no data rewrite — up to ``max_retries`` times before raising
    VersionConflictError. Append commits re-read the new parent each
    retry, so the final manifest always extends the version that actually
    preceded it.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    max_retries = 10
    if expectations:
        violations = {
            k: v for k, v in check_expectations(df, expectations).items() if v
        }
        if violations:
            raise ExpectationError(
                f"commit rejected: expectation violations {violations}"
            )
        extra = dict(extra or {})
        extra["expectations_passed"] = sorted(expectations)
    if extra:
        for k in ("version", "mode", "files"):
            if k in extra:
                raise ValueError(f"extra may not override manifest key {k!r}")
    # Unique data dir: the commit point is the manifest claim below, so a
    # crashed or losing attempt leaves only orphan files that vacuum (or
    # vacuum_catalog) reclaims — never a half-visible version.
    data_dir = os.path.join(table_path, _DATA, f"w-{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").parquet(data_dir)
    new_files = _data_files(data_dir)
    new_stats = _footer_stats(new_files, list(stats_cols)) if stats_cols else {}
    new_blooms = (
        _file_blooms(new_files, list(bloom_cols), bloom_bits, bloom_k)
        if bloom_cols
        else {}
    )
    for attempt in range(max_retries + 1):
        versions = list_versions(table_path)
        version = (versions[-1] + 1) if versions else 0
        files = list(new_files)
        stats: dict = {}
        blooms: dict = {}
        bloom_params = (
            {"m_bits": bloom_bits, "k": bloom_k} if bloom_cols else None
        )
        if mode == "append" and versions:
            parent = read_manifest(table_path, versions[-1])
            files = parent["files"] + files
            stats.update(parent.get("file_stats", {}))
            blooms.update(parent.get("file_blooms", {}))
            parent_params = parent.get("bloom_params")
            if bloom_params is None:
                bloom_params = parent_params
            elif parent_params is not None and parent_params != bloom_params:
                raise ValueError(
                    "bloom params are fixed at the layer's first bloom "
                    f"commit: parent {parent_params}, got {bloom_params}"
                )
        stats.update(new_stats)
        blooms.update(new_blooms)
        manifest = {"version": version, "mode": mode, "files": sorted(files)}
        if stats:
            manifest["file_stats"] = stats
        if blooms:
            manifest["file_blooms"] = blooms
            manifest["bloom_params"] = bloom_params
        if extra:
            manifest.update(extra)
        try:
            _publish(table_path, manifest)
            return version
        except VersionConflictError:
            if attempt == max_retries:
                raise


def read_version(
    spark: SparkSession, table_path: str, version: int | None = None,
    prune: tuple[str, object, object] | None = None,
    prune_eq: tuple[str, object] | None = None,
) -> DataFrame:
    """Time-travel read: the table exactly as of ``version`` (default:
    latest). The explicit file list bypasses directory listing entirely
    and pins the snapshot even if later commits land mid-query.

    ``prune=(col, lo, hi)`` drops files whose recorded [min, max] for
    ``col`` cannot intersect [lo, hi] (either bound None = unbounded) —
    manifest-level skipping BEFORE Spark plans the scan, on top of the
    row-group skipping the parquet reader does itself. Files without
    recorded stats for the column are conservatively kept, so the read
    stays a superset-correct plan plus the pushed-down filter — callers
    still apply their own ``where``; prune only shrinks the file list.

    ``prune_eq=(col, value)`` is the point-lookup twin over the per-file
    bloom bitmaps (``commit_version(bloom_cols=...)``): a file is dropped
    when its bitmap PROVES the value absent — the id-lookup path where
    min/max covers everything. Same conservative contract: bitmap-less
    files are kept, and callers still apply their own equality filter.
    """
    import base64

    versions = list_versions(table_path)
    if not versions:
        raise ValueError(f"no versions committed at {table_path}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"version {version} not in {versions}")
    manifest = read_manifest(table_path, version)
    files = manifest["files"]
    if not files:
        raise ValueError(f"version {version} has an empty file list")
    if prune is not None:
        col, lo, hi = prune
        stats = manifest.get("file_stats", {})

        def keep(f: str) -> bool:
            mm = stats.get(f, {}).get(col)
            if not mm:
                return True  # no stats recorded: conservative
            fmin, fmax = mm
            if lo is not None and fmax < lo:
                return False
            if hi is not None and fmin > hi:
                return False
            return True

        files = [f for f in files if keep(f)]
    if prune_eq is not None and files:
        col, value = prune_eq
        blooms = manifest.get("file_blooms", {})
        params = manifest.get("bloom_params") or {}
        m_bits, k = params.get("m_bits", 8192), params.get("k", 3)
        positions = _bloom_positions_py(value, m_bits, k)

        def maybe_contains(f: str) -> bool:
            b64 = blooms.get(f, {}).get(col)
            if not b64:
                return True  # no bitmap recorded: conservative
            bits = base64.b64decode(b64)
            return all(bits[p >> 3] & (1 << (p & 7)) for p in positions)

        files = [f for f in files if maybe_contains(f)]
    if not files:
        # every file pruned: empty frame with the table's schema
        return spark.read.parquet(manifest["files"][0]).limit(0)
    return spark.read.parquet(*files)


def rollback(table_path: str, to_version: int) -> int:
    """Publish a new version whose file set is ``to_version``'s — the
    bad-load undo. Metadata-only (no data moves), so it is O(1) at any
    table size, and the bad version remains readable for forensics."""
    old = read_manifest(table_path, to_version)  # raises if absent
    version = list_versions(table_path)[-1] + 1
    _publish(
        table_path,
        {
            "version": version,
            "mode": "rollback",
            "rolled_back_to": to_version,
            "files": old["files"],
        },
    )
    return version


def vacuum(
    table_path: str,
    keep_versions: int = 2,
    protect: Sequence[int] = (),
    min_age_seconds: float = 3600.0,
) -> list[str]:
    """Drop data files unreferenced by the newest ``keep_versions``
    manifests (and drop the older manifests). Returns removed files.

    The storage-reclaim half of the overwrite/rollback story. Runs on
    manifest metadata only — never lists or inspects parquet contents.

    ``protect`` pins additional version numbers whose manifests and files
    must survive regardless of age. Tables managed by a catalog
    (sources/catalog.py) MUST be vacuumed through ``vacuum_catalog``,
    which computes the pins from every catalog manifest — a catalog
    snapshot may pin a table version far older than ``keep_versions``
    (carried-forward pins make this common), and vacuuming it away would
    break ``read_catalog``/``rollback_catalog`` on that snapshot.

    ``min_age_seconds`` is the in-flight-commit grace window (Delta's
    retention check): a writer lays data down BEFORE claiming its
    manifest, so an unreferenced-but-young data directory may belong to a
    commit about to publish — deleting it would make that version
    unreadable the moment it lands. Directories younger than the window
    are skipped; 0 disables the guard (tests, known-quiesced tables).
    The same window bounds how far back the streaming sinks' replay
    probe can see (streaming/sink.py _txn_state)."""
    import time

    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    versions = list_versions(table_path)
    keep = set(versions[-keep_versions:]) | (set(protect) & set(versions))
    referenced: set[str] = set()
    for v in keep:
        referenced.update(read_manifest(table_path, v)["files"])
    removed = []
    for v in versions:
        if v in keep:
            continue
        os.remove(_manifest_path(table_path, v))
    data_root = os.path.join(table_path, _DATA)
    now = time.time()
    if os.path.isdir(data_root):
        for d in sorted(os.listdir(data_root)):
            vdir = os.path.join(data_root, d)
            live = any(f in referenced for f in _data_files(vdir))
            if live:
                continue
            if now - os.path.getmtime(vdir) < min_age_seconds:
                continue  # possibly an in-flight commit's data
            removed.extend(_data_files(vdir))
            shutil.rmtree(vdir)
    return removed


def version_diff(
    spark: SparkSession,
    table_path: str,
    old_version: int,
    new_version: int,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """CDC between two table versions: time-travel both, classify with
    operators.linkage.snapshot_diff (added/removed/changed)."""
    from synthea2omop_etl_spark.operators.linkage import snapshot_diff

    return snapshot_diff(
        read_version(spark, table_path, old_version),
        read_version(spark, table_path, new_version),
        keys,
        compare_cols,
    )


def merge_into(
    spark: SparkSession,
    table_path: str,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
    insert_unmatched: bool = True,
    delete_missing: bool = False,
    extra: dict | None = None,
) -> int:
    """MERGE INTO on a versioned table — the general UPDATE..FROM /
    upsert the reference runs in Postgres (etl_concept_mapping.py's
    UPDATE..FROM shape), with Delta-style semantics:

    - source row matches a target key → target row is UPDATED
      (``update_cols``, default: every shared non-key column),
    - source row matches nothing → INSERTED (``insert_unmatched``),
    - target key absent from source → kept, or DELETED when
      ``delete_missing`` (full-snapshot reconciliation mode).

    Ambiguity guard: more than one source row per key raises (the same
    error Delta throws) — a nondeterministic merge is a data bug, not a
    choice. The result commits as a new OVERWRITE version, so the
    pre-merge table stays one time-travel read away and a bad merge is
    a metadata-only ``rollback``. Plan shape: one left-anti join (kept
    target rows) + one inner join (updated rows) + the unmatched-source
    anti join — all equi-joins on the merge keys; at scale they
    co-locate on a bucketed/partitioned key layout. The rewrite cost is
    the full table (overwrite commit); for partition-local merges pair
    with overwrite_partitions instead.
    """
    from pyspark.sql import functions as F

    keys = list(keys)
    target = read_version(spark, table_path)
    dup = (
        source.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"merge source has multiple rows for key {dict((k, dup[0][k]) for k in keys)!r}"
        )
    if update_cols is None:
        update_cols = [
            c for c in target.columns if c not in keys and c in source.columns
        ]
    missing = [c for c in list(update_cols) + keys if c not in source.columns]
    if missing:
        raise ValueError(f"source lacks merge columns {missing}")

    if delete_missing:
        # unmatched target rows are deleted; matched rows come from
        # ``updated`` below, so nothing is kept as-is
        kept = target.limit(0)
    else:
        kept = target.join(source.select(*keys), keys, "left_anti")
    updated = (
        target.alias("t")
        .join(source.alias("s"), keys, "inner")
        .select(
            *[F.col(f"t.{k}").alias(k) for k in keys],
            *[
                (F.col(f"s.{c}") if c in update_cols else F.col(f"t.{c}")).alias(c)
                for c in target.columns
                if c not in keys
            ],
        )
        .select(*target.columns)
    )
    parts = [kept.select(*target.columns), updated]
    if insert_unmatched:
        inserts = source.join(target.select(*keys), keys, "left_anti")
        proj = [
            (
                F.col(c) if c in inserts.columns else F.lit(None).cast(
                    target.schema[c].dataType
                )
            ).alias(c)
            for c in target.columns
        ]
        parts.append(inserts.select(*proj))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return commit_version(out, table_path, mode="overwrite", extra=extra)
