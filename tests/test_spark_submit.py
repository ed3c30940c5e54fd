"""The literal north-rule deployment shape, end-to-end as a subprocess:

    spark-submit --py-files rap_etl_spark.zip launcher.py ...

on a ``local-cluster[2,2,...]`` master — two SEPARATE executor JVMs that
receive the engine code ONLY via the ``--py-files`` zip (the subprocess
runs from a scratch cwd with no repo on sys.path), synth a small WAL,
replay it into a fresh lake table, and report final state. This is the
one test where the packaging itself is the thing under test; everything
else in the suite runs in-process against the session fixture.
"""

import json
import os
import subprocess
import sys
import zipfile

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LAUNCHER = """\
import json
import sys

from pyspark.sql import SparkSession

# Create the session FIRST via the plain builder: spark-submit supplies
# spark.master / executor conf, and rap_etl_spark.cli reuses the active
# session rather than forcing its own master (see cli._spark).
spark = SparkSession.builder.getOrCreate()
# executors register asynchronously: wait until the cluster's full core
# count is visible before reporting (and before timing-sensitive work)
import time

cores = spark.sparkContext.defaultParallelism
for _ in range(120):
    cores = spark.sparkContext.defaultParallelism
    if cores >= 4:
        break
    time.sleep(0.5)
print(json.dumps({"master": spark.sparkContext.master, "execs": cores}))

from rap_etl_spark.cli import main  # noqa: E402  (needs the --py-files zip)

rc = 0
with open(sys.argv[1]) as f:
    for argv in json.load(f):
        rc = rc or main(argv)
sys.exit(rc)
"""


def _build_zip(dest: str) -> None:
    pkg = os.path.join(REPO, "rap_etl_spark")
    with zipfile.ZipFile(dest, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    p = os.path.join(root, fn)
                    zf.write(p, os.path.relpath(p, REPO))


def _spark_home() -> str:
    dist = "/opt/spark-4.1.2-bin-hadoop3"
    return dist if os.path.isdir(dist) else os.path.dirname(pyspark.__file__)


def test_spark_submit_pyfiles_local_cluster(tmp_path):
    zpath = str(tmp_path / "rap_etl_spark.zip")
    _build_zip(zpath)
    launcher = tmp_path / "launcher.py"
    launcher.write_text(LAUNCHER)

    sf = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    log = str(tmp_path / "log")
    table = str(tmp_path / "docs")
    cmds = [
        ["synth", "--out", log, "--events", "4000", "--sf", sf,
         "--batches", "2", "--packed"],
        ["init", "--table", table, "--buckets", "8"],
        ["replay", "--table", table, "--log", log],
        ["status", "--table", table],
    ]
    cmds_file = tmp_path / "cmds.json"
    cmds_file.write_text(json.dumps(cmds))

    spark_home = _spark_home()
    submit = os.path.join(spark_home, "bin", "spark-submit")
    env = dict(os.environ)
    env.update(
        SPARK_HOME=spark_home,
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
    )
    # scratch cwd + no PYTHONPATH: the engine must arrive via --py-files
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            submit,
            "--master", "local-cluster[2,2,1536]",
            "--conf", "spark.executor.memory=1024m",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            str(launcher), str(cmds_file),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
        check=False,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    recs = [json.loads(ln) for ln in proc.stdout.splitlines()
            if ln.startswith("{")]
    banner = recs[0]
    assert banner["master"].startswith("local-cluster[2,2"), banner
    assert banner["execs"] == 4  # 2 executors x 2 cores actually registered
    applied = [r for r in recs if "batch_id" in r]
    assert [r["batch_id"] for r in applied] == [0, 1]
    assert all(not r["skipped"] for r in applied)
    status = recs[-1]
    assert status["committed_batches"] == ["0", "1"]
    assert status["rows"] > 0
    assert "array<int>" in status["schema"]
