"""End-to-end smoke of tools/run_data_prep.py — the composed
training-data-prep pipeline (quality → scrub → dedup → cap/mixture →
shuffle → pack → shards)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_data_prep_pipeline_runs_end_to_end(tmp_path):
    out = tmp_path / "shards"
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "run_data_prep.py"),
         "--sf-dir", "/root/testdata/sf0.001", "--cpus", "8",
         "--out", str(out), "--seq-len", "128"],
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    m = json.loads(line)
    assert m["docs_in"] > 0
    assert 0 < m["docs_after_dedup"] <= m["docs_in"]
    assert m["sequences"] > 0 and m["tokens_packed"] >= m["sequences"]
    # DSIR keeps ~90% of the mixed survivors (never more, never zero)
    assert 0 < m["docs_selected"] <= m["docs_mixed"]
    # the grouped split partitions the post-selection docs exhaustively
    assert sum(m["docs_by_split"].values()) == m["docs_selected"]
    assert m["docs_packed"] == m["docs_by_split"].get("train", 0) > 0
    assert set(m["docs_by_split"]) <= {"train", "val", "test"}
    # shards really landed, partitioned and readable
    assert any(out.rglob("*.parquet"))
