"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship bloom-semi-join at sf0.001; queries() exposes
the full repertoire from presto_bloomfilter_spark.plans.queries; each
oracle_sql() entry is the ANSI-SQL equivalent DuckDB runs on the same
parquet tables (plus the deterministic synthetic tokens corpus, which
this module materializes on import so DuckDB can read it without
importing Spark).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import DataFrame, SparkSession

from presto_bloomfilter_spark.plans.queries import ORACLES, QUERIES
from presto_bloomfilter_spark.sources.corpus import ensure_tokens_parquet

# materialize the deterministic tokens corpus for Spark AND DuckDB
for _sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
    try:
        ensure_tokens_parquet(_sf)
    except Exception:  # pragma: no cover — testdata missing in dev envs
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["bloom_semijoin"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # a few oracles are lazy callables (they precompute expected values
    # in pure Python and emit a VALUES table) — resolve them here so the
    # driver always receives plain SQL strings
    return {k: (v() if callable(v) else v) for k, v in ORACLES.items()}
