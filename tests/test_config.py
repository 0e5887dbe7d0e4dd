"""ConfigLoader parity tests — a port of the reference's only unit-tested
module (tests/test_config_loader.py:21-179): env access, dot-path config
access, the db-config view, and concept-id mapping lookups, plus the .env
parser and the CLI --config/--env-file wiring the reference exposes
through its deployment scripts."""

from __future__ import annotations

import json
import os
from unittest.mock import patch

from synthea2omop_etl_spark.config import ConfigLoader, parse_env_file

CONFIG_JSON = {
    "project": {"name": "Test Project", "version": "0.1.0"},
    "database": {"connection_timeout": 15, "max_connections": 5},
    "etl": {"batch_size": 5000, "enable_logging": False},
    "mapping": {
        "gender": {"M": 1, "F": 2},
        "race": {"white": 10, "black": 11},
    },
}

ENV_TEXT = """
# deployment overlay
DB_HOST=testhost
DB_PORT=5433
DB_NAME=testdb
DB_USER=testuser
export DB_PASSWORD='testpass'
OMOP_SCHEMA="test_omop"
WITH_HEADER=false
PARALLEL_JOBS=2
not a valid line
"""


def _loader(tmp_path, env=ENV_TEXT, config=CONFIG_JSON):
    env_file = tmp_path / ".env"
    env_file.write_text(env)
    config_file = tmp_path / "config.json"
    config_file.write_text(json.dumps(config))
    return ConfigLoader(env_file=env_file, config_file=config_file)


def test_parse_env_file(tmp_path):
    p = tmp_path / ".env"
    p.write_text(ENV_TEXT)
    d = parse_env_file(p)
    assert d["DB_HOST"] == "testhost"
    assert d["DB_PASSWORD"] == "testpass"  # export + quotes stripped
    assert d["OMOP_SCHEMA"] == "test_omop"
    assert "not a valid line" not in d


def test_get_env(tmp_path):
    # reference test_get_env: file values visible, defaults honoured
    with patch.dict(os.environ, {}, clear=True):
        cfg = _loader(tmp_path)
        assert cfg.get_env("DB_HOST") == "testhost"
        assert cfg.get_env("DB_PORT") == "5433"
        assert cfg.get_env("NONEXISTENT", "default") == "default"


def test_env_does_not_override_process(tmp_path):
    # dotenv contract: an already-set process variable wins over the file
    with patch.dict(os.environ, {"DB_HOST": "fromprocess"}, clear=True):
        cfg = _loader(tmp_path)
        assert cfg.get_env("DB_HOST") == "fromprocess"
        assert cfg.get_env("DB_NAME") == "testdb"  # unset ones still load


def test_get_config_dot_paths(tmp_path):
    # reference test_get_config
    cfg = _loader(tmp_path)
    assert cfg.get_config("project.name") == "Test Project"
    assert cfg.get_config("project.version") == "0.1.0"
    assert cfg.get_config("database.connection_timeout") == 15
    assert cfg.get_config("etl.batch_size") == 5000
    assert cfg.get_config("nonexistent.path", "default") == "default"
    # non-dict midway returns default, not a TypeError
    assert cfg.get_config("project.name.deeper", "d") == "d"


def test_get_db_config(tmp_path):
    # reference test_get_db_config (+ the Spark-era jdbc_url view)
    with patch.dict(os.environ, {}, clear=True):
        cfg = _loader(tmp_path)
        db = cfg.get_db_config()
        assert db["host"] == "testhost"
        assert db["port"] == "5433"
        assert db["dbname"] == "testdb"
        assert db["user"] == "testuser"
        assert db["password"] == "testpass"
        assert db["jdbc_url"] == "jdbc:postgresql://testhost:5433/testdb"


def test_get_concept_id(tmp_path):
    # reference test_get_concept_id
    cfg = _loader(tmp_path)
    assert cfg.get_concept_id("gender", "M") == 1
    assert cfg.get_concept_id("gender", "F") == 2
    assert cfg.get_concept_id("race", "white") == 10
    assert cfg.get_concept_id("race", "black") == 11
    assert cfg.get_concept_id("gender", "X") is None
    assert cfg.get_concept_id("nonexistent", "code") is None


def test_schema_names_and_processing_options(tmp_path):
    with patch.dict(os.environ, {}, clear=True):
        cfg = _loader(tmp_path)
        assert cfg.get_schema_names()["omop"] == "test_omop"
        assert cfg.get_schema_names()["staging"] == "staging"  # default
        opts = cfg.get_processing_options()
        assert opts["with_header"] is False
        assert opts["parallel_jobs"] == 2
        assert opts["batch_size"] == 5000
        assert opts["enable_logging"] is False
        assert opts["truncate_target_tables"] is True  # json default


def test_missing_files_are_soft(tmp_path):
    cfg = ConfigLoader(
        env_file=tmp_path / "absent.env", config_file=tmp_path / "absent.json"
    )
    assert cfg.get_config("anything", 7) == 7
    assert cfg.config_data == {}


def test_broken_json_is_soft(tmp_path):
    p = tmp_path / "config.json"
    p.write_text("{ not json")
    cfg = ConfigLoader(env_file=None, config_file=p)
    assert cfg.config_data == {}
    assert cfg.get_config("etl.batch_size", 123) == 123


def test_cli_run_with_config_and_env_file(tmp_path, capsys, spark):
    """`run --config --env-file` with NO --input/--output flags resolves the
    paths from the deployment files (the reference deployment shape)."""
    import csv

    from synthea2omop_etl_spark.cli import main
    from tests import fixtures_synthea as fx

    src = tmp_path / "synthea"
    src.mkdir()
    for name, cols, rows in [
        ("patients", fx.PATIENT_COLS, fx.PATIENTS),
        ("encounters", fx.ENCOUNTER_COLS, fx.ENCOUNTERS),
    ]:
        with open(src / f"{name}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(cols)
            w.writerows(rows)
    out_dir = tmp_path / "omop_out"
    env_file = tmp_path / "deploy.env"
    env_file.write_text(
        f"SYNTHEA_DATA_DIR={src}\nOUTPUT_DIR={out_dir}\n"
    )
    config_file = tmp_path / "config.json"
    config_file.write_text(json.dumps({"etl": {"partition_by_year": False}}))
    with patch.dict(os.environ, {}, clear=False):
        os.environ.pop("SYNTHEA_DATA_DIR", None)
        os.environ.pop("OUTPUT_DIR", None)
        rc = main(
            [
                "run",
                "--config", str(config_file),
                "--env-file", str(env_file),
            ]
        )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["tables"]["person"] == len(fx.PATIENTS)
    assert (out_dir / "omop_person").exists()


def test_cli_run_missing_paths_errors(tmp_path, capsys):
    from synthea2omop_etl_spark.cli import main

    with patch.dict(os.environ, {}, clear=False):
        os.environ.pop("SYNTHEA_DATA_DIR", None)
        os.environ.pop("OUTPUT_DIR", None)
        rc = main(["run"])
    assert rc == 2
    assert "required" in capsys.readouterr().err


def test_cli_validate_config_dqd_ranges(tmp_path, capsys, spark):
    """validate --config: dqd.measurement_ranges from config.json override
    the concept-appropriate plausibility thresholds (the fixture's -0.5
    Cel temperature fails under defaults, passes under a widened range)."""
    import csv

    from synthea2omop_etl_spark.cli import main
    from tests import fixtures_synthea as fx

    src = tmp_path / "synthea"
    src.mkdir()
    for name, cols, rows in [
        ("patients", fx.PATIENT_COLS, fx.PATIENTS),
        ("encounters", fx.ENCOUNTER_COLS, fx.ENCOUNTERS),
        ("observations", fx.OBSERVATION_COLS, fx.OBSERVATIONS),
    ]:
        with open(src / f"{name}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(cols)
            w.writerows(rows)
    out_dir = str(tmp_path / "omop")
    assert main(["run", "--input", str(src), "--output", out_dir]) == 0
    capsys.readouterr()

    cfg = tmp_path / "config.json"
    cfg.write_text(
        json.dumps({"dqd": {"measurement_ranges": {"8310-5": [-5, 45]}}})
    )

    def dqd_failures(argv):
        main(argv)
        report = json.loads(capsys.readouterr().out)
        return [r for r in report["dqd"] if r["failed"]]

    # defaults: the -0.5 Cel body temperature is implausible
    fails = dqd_failures(["validate", "--omop", out_dir])
    assert any("8310-5" in r["issue_description"] for r in fails)
    # config-widened range clears it
    fails = dqd_failures(
        ["validate", "--omop", out_dir, "--config", str(cfg)]
    )
    assert not any("8310-5" in r["issue_description"] for r in fails)
