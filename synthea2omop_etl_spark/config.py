"""Deployment configuration: JSON config + ``.env`` overlay with dot-path
access and concept-id mapping lookups.

Parity target: the reference's only unit-tested utility,
``utils/config_loader.py:23-171`` (tests ``tests/test_config_loader.py:21-179``)
— a ``ConfigLoader`` that merges a ``.env`` file into the process
environment, parses ``config.json``, exposes ``get_env`` / dot-path
``get_config`` / ``get_concept_id``, and bundles the deployment views
(``get_db_config``, ``get_schema_names``, ``get_file_paths``,
``get_processing_options``). A user porting a reference deployment drops
the same two files next to this engine and `cli.py --config` honours them.

Differences, deliberately:

- no ``python-dotenv`` dependency — ``.env`` is a 20-line format (KEY=VALUE,
  ``#`` comments, optional quotes) parsed here; already-set process
  variables WIN over the file, same as ``load_dotenv(override=False)``.
- paths are explicit constructor arguments (no module-import singleton
  bound to the package's own directory — an engine runs where the data
  is, not where the code is). Missing files are warnings, not errors,
  exactly like the reference.
- the Postgres connection block becomes the JDBC URL/properties that
  ``sources/jdbc.py`` consumes, and ``parallel_jobs`` maps onto
  ``spark.sql.shuffle.partitions`` guidance rather than a process pool.
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Any

logger = logging.getLogger(__name__)


def parse_env_file(path: str | os.PathLike) -> dict[str, str]:
    """Parse a ``.env`` file → dict. KEY=VALUE lines; ``#`` starts a
    comment; leading ``export`` and surrounding single/double quotes are
    stripped. Malformed lines are skipped (the reference's dotenv does
    the same rather than failing a deployment on one stray line)."""
    out: dict[str, str] = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            if line.startswith("export "):
                line = line[len("export "):].lstrip()
            key, _, val = line.partition("=")
            key = key.strip()
            val = val.strip()
            if len(val) >= 2 and val[0] == val[-1] and val[0] in ("'", '"'):
                val = val[1:-1]
            if key:
                out[key] = val
    return out


class ConfigLoader:
    """Load settings from a ``.env`` file and a ``config.json`` file.

    ``env_file`` values are merged into ``os.environ`` WITHOUT overriding
    variables already set (deployment env beats file, the standard dotenv
    contract), so ``get_env`` reads one unified view. ``config_file`` is
    plain JSON; a parse error logs and yields an empty config (reference
    behavior: a broken config.json must not take the CLI down with a
    traceback — the defaults still apply).
    """

    def __init__(
        self,
        env_file: str | os.PathLike | None = ".env",
        config_file: str | os.PathLike | None = "config.json",
    ) -> None:
        self.env_file = Path(env_file) if env_file else None
        self.config_file = Path(config_file) if config_file else None
        self.config_data: dict[str, Any] = {}
        self._load_env_vars()
        self._load_config_json()

    def _load_env_vars(self) -> None:
        if self.env_file is None:
            return
        if self.env_file.exists():
            for k, v in parse_env_file(self.env_file).items():
                os.environ.setdefault(k, v)
            logger.info("loaded environment overlay from %s", self.env_file)
        else:
            logger.warning("environment file %s not found", self.env_file)

    def _load_config_json(self) -> None:
        if self.config_file is None:
            return
        if self.config_file.exists():
            try:
                with open(self.config_file) as fh:
                    self.config_data = json.load(fh)
            except json.JSONDecodeError as e:
                logger.error("error parsing %s: %s", self.config_file, e)
                self.config_data = {}
        else:
            logger.warning("config file %s not found", self.config_file)

    # -- accessors (reference: config_loader.py get_env/get_config) -------

    def get_env(self, key: str, default: Any = None) -> Any:
        return os.environ.get(key, default)

    def get_config(self, path: str, default: Any = None) -> Any:
        """Dot-path lookup into config.json: ``get_config('etl.batch_size')``.
        Any missing segment (or a non-dict midway) returns ``default``."""
        value: Any = self.config_data
        for part in path.split("."):
            if isinstance(value, dict) and part in value:
                value = value[part]
            else:
                return default
        return value

    def get_concept_id(self, category: str, code: str) -> int | None:
        """Concept-id mapping lookup: ``mapping.<category>.<code>`` →
        int concept id, or None when either level is absent."""
        mapping = self.get_config(f"mapping.{category}", {})
        if not isinstance(mapping, dict):
            return None
        return mapping.get(code)

    # -- deployment views (same keys as the reference, Spark-shaped) ------

    def get_db_config(self) -> dict[str, str]:
        """Connection settings under the reference's env-var names. The
        extra ``jdbc_url`` key is what ``sources/jdbc.py`` actually takes."""
        host = self.get_env("DB_HOST", "localhost")
        port = self.get_env("DB_PORT", "5432")
        dbname = self.get_env("DB_NAME", "synthea")
        return {
            "host": host,
            "port": port,
            "dbname": dbname,
            "user": self.get_env("DB_USER", "postgres"),
            "password": self.get_env("DB_PASSWORD", ""),
            "jdbc_url": f"jdbc:postgresql://{host}:{port}/{dbname}",
        }

    def get_schema_names(self) -> dict[str, str]:
        return {
            "omop": self.get_env("OMOP_SCHEMA", "omop"),
            "staging": self.get_env("STAGING_SCHEMA", "staging"),
            "population": self.get_env("POPULATION_SCHEMA", "population"),
        }

    def get_file_paths(self) -> dict[str, str]:
        """Where the data lives. No code-relative defaults: an unset path
        is an empty string the CLI treats as "flag required"."""
        return {
            "vocab_dir": self.get_env("VOCAB_DIR", ""),
            "synthea_data_dir": self.get_env("SYNTHEA_DATA_DIR", ""),
            "output_dir": self.get_env("OUTPUT_DIR", ""),
        }

    def get_processing_options(self) -> dict[str, Any]:
        """Reference keys preserved; Spark-era meanings documented:
        ``parallel_jobs`` sizes ``spark.sql.shuffle.partitions`` (the
        engine-level parallelism knob), ``batch_size`` is accepted for
        config compatibility but unused (no row batching in a distributed
        scan), ``truncate_target_tables`` maps to overwrite-vs-append."""
        def _int(raw, default: int, what: str) -> int:
            try:
                return int(raw)
            except (TypeError, ValueError):
                # a malformed value in a field this run never uses must not
                # take the CLI down with a traceback — same soft contract
                # as a broken config.json
                logger.error("invalid integer for %s: %r (using %d)",
                             what, raw, default)
                return default

        return {
            "with_header": str(self.get_env("WITH_HEADER", "true")).lower()
            == "true",
            "parallel_jobs": _int(
                self.get_env("PARALLEL_JOBS", "4"), 4, "PARALLEL_JOBS"
            ),
            "batch_size": _int(
                self.get_config("etl.batch_size", 10000), 10000,
                "etl.batch_size",
            ),
            "enable_logging": self.get_config("etl.enable_logging", True),
            "truncate_target_tables": self.get_config(
                "etl.truncate_target_tables", True
            ),
            "repair_malformed": bool(
                self.get_config("etl.repair_malformed", False)
            ),
            "partition_by_year": bool(
                self.get_config("etl.partition_by_year", False)
            ),
            "bucket_by": self.get_config("etl.bucket_by", None),
            "n_buckets": _int(
                self.get_config("etl.n_buckets", 32), 32, "etl.n_buckets"
            ),
        }
