"""Multi-executor packaging test: the engine shipped to SEPARATE
executor JVMs via ``spark-submit --py-files`` on a ``local-cluster``
master runs the CDC merge end-to-end and converges to the same state.

This is the only test that leaves the shared local[8] session — it
boots a standalone-mode mini-cluster (2 executor JVM processes), so it
costs minutes and is opt-in: ``BEAR_TEST_CLUSTER=1 pytest
tests/test_cluster_submit.py``. The default suite stays fast; the
round's BENCH evidence (BENCH/run_cluster_scaling.py) exercises the
same path at benchmark scale.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("BEAR_TEST_CLUSTER") != "1",
    reason="multi-executor-JVM test is opt-in (BEAR_TEST_CLUSTER=1); boots a local-cluster",
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import json, os, sys
sys.path.insert(0, {repo!r})
from bear_spark.events import change_events
from bear_spark.lake import LakeTable
from bear_spark.schema import KEY_COLS, TRANSCRIPT_SCHEMA
from bear_spark.session import get_spark
from bear_spark import oracle

spark = get_spark(app_name="cluster_submit_test", cores=2,
                  shuffle_partitions=8, driver_memory="2g")
assert spark.sparkContext.master.startswith("local-cluster"), spark.sparkContext.master

ev = change_events(spark, 30_000, n_convs=80, seed=13).cache()
ev.count()
tbl = LakeTable.create(spark, os.path.join({work!r}, "tbl"),
                       TRANSCRIPT_SCHEMA, key_cols=KEY_COLS, num_buckets=4)
m = tbl.merge(ev)
got = tbl.read().toPandas()
exp = oracle.replay(ev.toPandas())
oracle.assert_states_equal(got, exp)
print(json.dumps({{"rows": len(got), "dedup_drops": m["dedup_drops"]}}))
"""


def test_merge_under_local_cluster_via_py_files(tmp_path):
    import pyspark

    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    zip_dir = tempfile.mkdtemp(prefix="bear_zip_")
    zip_path = os.path.join(zip_dir, "bear_spark")
    shutil.make_archive(zip_path, "zip", root_dir=REPO, base_dir="bear_spark")

    script = tmp_path / "driver.py"
    script.write_text(DRIVER.format(repo=REPO, work=str(tmp_path)))

    env = dict(os.environ, SPARK_GRAFT_MASTER="local-cluster[2,1,1536]")
    out = subprocess.run(
        [submit, "--master", "local-cluster[2,1,1536]", "--driver-memory", "2g",
         "--py-files", zip_path + ".zip", str(script)],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    stats = json.loads(line)
    assert stats["rows"] > 0 and stats["dedup_drops"] > 0
