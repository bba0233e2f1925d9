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
