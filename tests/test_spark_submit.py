"""End-to-end spark-submit --py-files evidence (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Packages ``presto_bloomfilter_spark`` into a zip, copies the workload
driver OUT of the repo, and launches it with ``spark-submit
--py-files pkg.zip`` from a cwd where the package is NOT importable —
so the import genuinely resolves through the shipped archive, exactly
as it would on a yarn/k8s cluster.  Asserts the workload's JSON
metrics line: bloom FPR within the configured bound, all sketch
sections present, checkpointed store populated.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SF_DIR = "/root/testdata/sf0.001"


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    try:
        import pyspark

        p = Path(pyspark.__file__).parent / "bin" / "spark-submit"
        return str(p) if p.exists() else None
    except ImportError:  # pragma: no cover
        return None


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not on this host")
def test_spark_submit_py_files_workload(tmp_path):
    # 1. package the library the way a cluster deploy would
    pkg_zip = tmp_path / "pbs.zip"
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in sorted((REPO / "presto_bloomfilter_spark").rglob("*.py")):
            zf.write(f, f.relative_to(REPO))

    # 2. driver script outside the repo: its sys.path tweak points at
    # tmp_path's parent, so only --py-files can satisfy the import
    driver = tmp_path / "run_workload.py"
    shutil.copy(REPO / "tools" / "run_workload.py", driver)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # no back-door path to the repo
    env["PBS_DATA_DIR"] = str(REPO / "data")  # reuse the generated corpus
    env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(pkg_zip),
            str(driver),
            "--sf-dir", SF_DIR,
            "--cpus", "4",
            "--store", str(tmp_path / "store"),
            "--job-id", "submit-e2e",
        ],
        capture_output=True, text=True, timeout=600, cwd=tmp_path, env=env,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-4000:]}"
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    m = json.loads(line)

    # workload invariants, same ones the plain-python path asserts
    assert m["rows"] > 0 and m["tokens"] > 0
    for section in ("bloom", "bloom_probe", "cms", "hll_by_source",
                    "kll_ntok", "token_family_fused", "tdigest_ntok",
                    "ddsketch_ntok", "countsketch_docid_f2"):
        assert section in m, f"missing workload section {section}"
    assert m["bloom"]["estimated_fpr"] <= 0.01
    assert m["bloom_probe"]["rows_hit"] == m["rows"]  # no false negatives
    assert m["ddsketch_ntok"]["p50"] <= m["ddsketch_ntok"]["p99"]
    assert m["countsketch_docid_f2"]["n"] == m["rows"]
    # bloom+cms+kll+family+tdigest+ddsketch+countsketch+per-source hlls
    assert m["store_keys"] >= 11

    # the sketches persisted by the submitted job must be loadable here
    sys.path.insert(0, str(REPO))
    from presto_bloomfilter_spark.store import SketchStore

    store = SketchStore(str(tmp_path / "store"))
    bloom = store.get("submit-e2e.bloom")
    assert bloom.size_bytes > 0
