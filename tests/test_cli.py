"""CLI smoke tests via spark-submit --py-files — the north_rule
deployment mode (reference test style: ``tests/test_cli.py`` drives the
typer app; here the real binary path is exercised end-to-end)."""

from __future__ import annotations

import json
import os
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "maritime_activity_reports_cdc_spark"


@pytest.fixture(scope="module")
def engine_zip(tmp_path_factory):
    z = tmp_path_factory.mktemp("zip") / "engine.zip"
    with zipfile.ZipFile(z, "w") as zf:
        for dirpath, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return str(z)


def _cli(engine_zip, *args: str) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        ["spark-submit", "--py-files", engine_zip,
         os.path.join(REPO, PKG, "cli.py"),
         "--master", "local[4]", "--shuffle-partitions", "8", *args],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def test_cli_setup_replay_status_compact_expire(spark, tmp_path, engine_zip):
    from maritime_activity_reports_cdc_spark.sources.generator import (
        generate_transcript_changes,
    )

    changes = generate_transcript_changes(
        spark, n_conversations=15, turns_per_conv=5, update_ratio=0.3, seed=41
    )
    changes_path = str(tmp_path / "changes")
    changes.coalesce(1).write.parquet(changes_path)
    root = str(tmp_path / "lake")

    out = _cli(engine_zip, "setup", "--root", root, "--n-buckets", "4",
               "--bronze-mode", "mor", "--layer-mode", "cow")
    assert out["n_buckets"] == 4 and out["bronze_mode"] == "mor"

    out = _cli(engine_zip, "replay", "--root", root, "--changes", changes_path,
               "--chunks", "2", "--checkpoint", str(tmp_path / "ck"))
    assert out["epochs_run"] == 2 and out["events"] > 0

    out = _cli(engine_zip, "status", "--root", root)
    assert out["tables"]["bronze"]["version"] > 0
    assert out["last_epoch_metrics"]["n_events"] > 0

    out = _cli(engine_zip, "compact", "--root", root)
    assert out["compacted"]

    out = _cli(engine_zip, "expire", "--root", root, "--keep-last", "1")
    assert out["bronze"]["manifests_removed"] >= 1
