"""Loaders for the driver-generated testdata tables (TESTDATA.md).

Keep scans narrow: callers should ``.select`` only needed columns so
Catalyst pushes column pruning into the parquet reader.
"""

from __future__ import annotations

import os

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark, sf_dir: str, name: str):
    if name not in TABLES:
        raise ValueError(f"unknown table {name}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark, sf_dir: str) -> None:
    """Register all testdata tables as temp views for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def load_source(spark, source: str, snapshot_id: int | str | None = None):
    """Load the north-rule input table from either backend:

    - ``"iceberg:<catalog.db.table>"`` — an Iceberg table, optionally
      pinned to ``snapshot_id`` (time-travel read: the SAME rows on
      every retry/resume, which is what makes checkpoint lineage
      meaningful — ``store.CheckpointedBuild`` stamps the id into its
      manifest and refuses to resume across snapshots);
    - any other string — a parquet path (this sandbox's testdata; the
      production layout is identical minus the catalog).

    The Iceberg branch needs the iceberg-spark runtime on the
    classpath; without it Spark raises its normal data-source-not-found
    error at load time — no silent fallback to a different table.
    """
    if source.startswith("iceberg:"):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(source[len("iceberg:"):])
    if snapshot_id is not None:
        raise ValueError(
            "snapshot_id requires an 'iceberg:' source; parquet paths "
            "have no snapshot log (pin a path-per-snapshot instead)")
    return spark.read.parquet(source)
