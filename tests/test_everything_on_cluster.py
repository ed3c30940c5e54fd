"""The everything-on cross-feature gate ACROSS REAL EXECUTOR JVM
BOUNDARIES (round-4 verdict item 8): submit tools/everything_on_scenario
via spark-submit on a ``local-cluster[2,2,...]`` master — two separate
executor JVMs that receive the engine only through ``--py-files`` — and
assert the full 6-batch feature-stack scenario passes there too. The
in-process twin (tests/test_everything_on.py) owns oracle-level
correctness; this gate owns the deployment shape."""

import json
import os
import subprocess
import sys

from .test_spark_submit import REPO, _build_zip, _spark_home

LAUNCHER = """\
import json
import sys
import time

from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()
for _ in range(120):
    if spark.sparkContext.defaultParallelism >= 4:
        break
    time.sleep(0.5)

from everything_on_scenario import run_scenario  # noqa: E402

print(json.dumps(run_scenario(spark, sys.argv[1], sys.argv[2])))
"""


def test_everything_on_local_cluster(tmp_path):
    zpath = str(tmp_path / "rap_etl_spark.zip")
    _build_zip(zpath)
    scenario = os.path.join(REPO, "tools", "everything_on_scenario.py")
    launcher = tmp_path / "launcher.py"
    launcher.write_text(LAUNCHER)
    work = tmp_path / "work"
    work.mkdir()

    sf = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    spark_home = _spark_home()
    submit = os.path.join(spark_home, "bin", "spark-submit")
    env = dict(os.environ)
    env.update(
        SPARK_HOME=spark_home,
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
    )
    env.pop("PYTHONPATH", None)  # the engine must arrive via --py-files
    proc = subprocess.run(
        [
            submit,
            "--master", "local-cluster[2,2,2048]",
            "--conf", "spark.executor.memory=1536m",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", f"{zpath},{scenario}",
            str(launcher), sf, str(work),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
        check=False,
    )
    assert proc.returncode == 0, proc.stderr[-6000:]
    recs = [
        json.loads(ln) for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    summary = recs[-1]
    assert summary["ok"] is True
    assert summary["execs"] == 4  # 2 executors x 2 cores registered
    assert summary["master"].startswith("local-cluster[2,2")
    assert summary["quarantined"] == 7  # 3 + 4 injected bad rows
    assert summary["rows"] > 0
