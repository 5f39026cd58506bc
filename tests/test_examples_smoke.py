"""Examples smoke suite (VERDICT r10 item #6): every examples/*.py executes
end-to-end against sf0.001 in CI, so the runnable documentation can't rot
silently. Each example asserts its own invariants when run (they raise on
violation), so 'main() returns' IS the check; runpy with run_name='__main__'
executes the exact path a user runs."""

from __future__ import annotations

import glob
import os
import runpy
import sys

import pytest

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(glob.glob(os.path.join(REPO_DIR, "examples", "*.py")))


def test_every_example_is_covered():
    # parametrization below enumerates files at collect time; this pins that
    # the glob actually found the suite (12 as of round 11)
    assert len(EXAMPLES) >= 12, EXAMPLES


@pytest.mark.examples
@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_runs(path, spark, monkeypatch, tmp_path):
    # examples read SPARK_GRAFT_SF_DIR at import time — pin the smoke SF and
    # sandbox any scratch output under the test tmp dir
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "wh"))
    monkeypatch.chdir(tmp_path)
    # pytest's argv would leak into argv-reading examples (text_to_vectors
    # takes sf_dir as argv[1])
    monkeypatch.setattr(sys, "argv", [path])
    # most examples end with spark.stop() — correct standalone, fatal to the
    # suite's session-scoped SparkSession when run in-process; no-op it
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    runpy.run_path(path, run_name="__main__")
