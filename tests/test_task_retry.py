"""Task-retry determinism: Spark retries a failed task from the same
input split; because every sketch kernel is a pure function of its
partition's rows and merges are associative/commutative, a retried
build must be byte-identical to a failure-free one — the property that
makes the library safe on real clusters where task loss is routine.

Runs in a subprocess because retry needs master local[N, maxFailures]
and the suite's shared session is plain local[N] (maxFailures=1, any
task failure kills the job)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_task_retry_reproduces_identical_sketches():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tests" / "drivers" / "retry_drive.py"),
         str(REPO)],
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "RETRY_DETERMINISM_OK" in proc.stdout
