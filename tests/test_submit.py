"""North-rule launch mode: the CDC replay runs as a REAL spark-submit
application with the package shipped via --py-files, exactly-once under
re-submission (BASELINE.json north_rule: "run via spark-submit
--py-files on a multi-executor cluster").

Uses pyspark's own bin/spark-submit (same JVM/py version as the test
session) with a fresh JVM per invocation — this is the one test that
exercises the production launch path end-to-end rather than an
in-process session.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pyspark
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                            "spark-submit")


def _submit(zip_path, table_root):
    cmd = [
        SPARK_SUBMIT, "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(REPO, "tools", "dj_replay.py"),
        "--synthetic", "1000", "--batch-size", "500",
        "--table-root", table_root, "--buckets", "4",
    ]
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=420,
                          env=env, cwd="/tmp")  # cwd OUTSIDE the repo:
    # the package must come from --py-files, not from an importable cwd
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="no spark-submit in this pyspark install")
def test_spark_submit_replay_exactly_once(tmp_path):
    from data_juicer_spark.session import build_pyfiles_zip

    zip_path = build_pyfiles_zip(str(tmp_path / "djs.zip"))
    root = str(tmp_path / "lake")

    first = _submit(zip_path, root)
    assert first["epochs_replayed"] == 2
    assert first["epochs_skipped_already_committed"] == 0
    assert first["final_rows"] > 0
    assert first["upserts"] > 0 and first["deletes"] > 0

    # re-submitting the SAME job = crash-recovery / double-delivery:
    # every epoch must be fenced off and the state digest unchanged
    second = _submit(zip_path, root)
    assert second["epochs_replayed"] == 0
    assert second["epochs_skipped_already_committed"] == 2
    assert second["state_digest"] == first["state_digest"]
    assert second["final_rows"] == first["final_rows"]

    shutil.rmtree(root, ignore_errors=True)
