"""YAML config surface (reference src/config_manager.py:1-83 +
config/config.yaml): load, defaults, dot-path get, env-var resolution,
strict validation, and CLI precedence (flags override file)."""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

import pytest

from wiki_data_pipeline_spark.config import PipelineConfig, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_defaults_without_file():
    cfg = load_config(None)
    assert cfg.processing.batch_size == 1000
    assert cfg.enrichment.global_qps == 2.0  # the reference's QPS contract
    assert cfg.naming.file_pattern == "article_{index:06d}.json"


def test_streaming_section(tmp_path):
    """The streaming-twin knobs load as a typed section with the same
    strictness as every other section."""
    path = tmp_path / "pipeline.yaml"
    path.write_text(
        "streaming:\n"
        "  source_dir: /data/incoming\n"
        "  max_files_per_trigger: '2'\n"  # quoted YAML → coerced to int
        "  metrics_path: /data/metrics.jsonl\n"
    )
    cfg = load_config(str(path))
    assert cfg.streaming.source_dir == "/data/incoming"
    assert cfg.streaming.max_files_per_trigger == 2
    assert cfg.streaming.metrics_path == "/data/metrics.jsonl"
    assert cfg.get("streaming.max_files_per_trigger") == 2
    # defaults when absent
    assert load_config(None).streaming.source_dir is None
    assert load_config(None).streaming.max_files_per_trigger == 4


def test_load_and_dot_path_get(tmp_path):
    path = tmp_path / "pipeline.yaml"
    path.write_text(
        """
storage:
  sf_dir: /data/in
  out_dir: /data/out
processing:
  batch_size: 250
  limit: 10
enrichment:
  max_retries: 5
spark:
  shuffle_partitions: 64
  extra_conf:
    spark.sql.adaptive.enabled: "true"
"""
    )
    cfg = load_config(str(path))
    assert cfg.get("storage.out_dir") == "/data/out"
    assert cfg.get("processing.batch_size") == 250
    assert cfg.get("enrichment.max_retries") == 5
    assert cfg.get("spark.extra_conf")["spark.sql.adaptive.enabled"] == "true"
    # unspecified sections keep defaults; missing keys use the default arg
    assert cfg.get("naming.directory_pattern") == "batch_{batch_num:03d}"
    assert cfg.get("no.such.key", "fallback") == "fallback"


def test_env_var_resolution(tmp_path, monkeypatch):
    path = tmp_path / "c.yaml"
    path.write_text("storage:\n  out_dir: ${WDPS_TEST_OUT}\n")
    monkeypatch.setenv("WDPS_TEST_OUT", "/resolved/out")
    assert load_config(str(path)).storage.out_dir == "/resolved/out"
    monkeypatch.delenv("WDPS_TEST_OUT")
    with pytest.raises(ValueError, match="WDPS_TEST_OUT"):
        load_config(str(path))


def test_unknown_section_and_key_rejected(tmp_path):
    bad_section = tmp_path / "s.yaml"
    bad_section.write_text("azure:\n  container: x\n")
    with pytest.raises(ValueError, match="unknown config section"):
        load_config(str(bad_section))
    bad_key = tmp_path / "k.yaml"
    bad_key.write_text("processing:\n  batchsize: 10\n")
    with pytest.raises(ValueError, match="batchsize"):
        load_config(str(bad_key))


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        load_config("/no/such/config.yaml")


def test_get_on_defaults():
    cfg = PipelineConfig()
    assert cfg.get("enrichment.initial_delay") == 0.05
    assert cfg.get("spark.master") is None


def test_cli_config_file_with_flag_override(sf_dir, tmp_path):
    """--config supplies defaults; explicit flags win (reference
    src/main.py precedence)."""
    out = str(tmp_path / "cfg_out")
    cfg_path = tmp_path / "run.yaml"
    cfg_path.write_text(
        f"""
storage:
  sf_dir: {sf_dir}
  out_dir: {out}
processing:
  limit: 5
  batch_size: 3
"""
    )
    res = subprocess.run(
        [sys.executable, "-m", "wiki_data_pipeline_spark",
         "--config", str(cfg_path), "--limit", "7"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["processed"] == 7  # CLI --limit 7 beats file limit 5
    files = glob.glob(os.path.join(out, "batch_*", "article_*.json"))
    assert len(files) == 7


def test_env_resolution_recurses_into_extra_conf(tmp_path, monkeypatch):
    """${VAR} values nested inside spark.extra_conf — exactly where
    credentials live — must resolve, not pass through as literals."""
    path = tmp_path / "c.yaml"
    path.write_text(
        """
spark:
  extra_conf:
    spark.hadoop.fs.s3a.secret.key: ${WDPS_TEST_SECRET}
"""
    )
    monkeypatch.setenv("WDPS_TEST_SECRET", "s3kr1t")
    cfg = load_config(str(path))
    assert cfg.spark.extra_conf["spark.hadoop.fs.s3a.secret.key"] == "s3kr1t"
    monkeypatch.delenv("WDPS_TEST_SECRET")
    with pytest.raises(ValueError, match="WDPS_TEST_SECRET"):
        load_config(str(path))


def test_numeric_values_coerced_at_load(tmp_path, monkeypatch):
    """Quoted-YAML and env-resolved values arrive as strings; numeric
    knobs must coerce at LOAD time (a TypeError mid-run after the sink
    wrote files is the failure mode the strict-load design forbids)."""
    path = tmp_path / "c.yaml"
    path.write_text(
        """
processing:
  batch_size: ${WDPS_TEST_BS}
  limit: "25"
  reset: "true"
enrichment:
  global_qps: "0.5"
"""
    )
    monkeypatch.setenv("WDPS_TEST_BS", "500")
    cfg = load_config(str(path))
    assert cfg.processing.batch_size == 500
    assert cfg.processing.limit == 25
    assert cfg.processing.reset is True
    assert cfg.enrichment.global_qps == 0.5


def test_bad_typed_value_fails_at_load(tmp_path):
    path = tmp_path / "c.yaml"
    path.write_text("processing:\n  batch_size: lots\n")
    with pytest.raises(ValueError, match="processing.batch_size"):
        load_config(str(path))
