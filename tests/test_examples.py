"""The examples/ scripts must actually run — they are the migration
documentation, and a doc that crashes is worse than none. Each runs in
a subprocess (own SparkSession, exactly as a user would invoke it)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.parametrize(
    "script",
    [
        "pipeline.py",
        "curation.py",
        "serving.py",
        "refresh.py",
        "analytics.py",
        "scale_toolkit.py",
        "dashboards.py",
        "audit.py",
        "contrastive.py",
        "streaming_cascade.py",
        "online_ingest.py",
        "tokenizer_media.py",
        "experimentation.py",
        "dedup_cdc.py",
    ],
)
def test_example_runs(script):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), SF_DIR],
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
