"""Reference-parity API: every SQL function presto-bloomfilter registers
(reference BloomFilterPlugin.java:42-55), one Python callable each, so a
reference user can switch query-for-query (SURVEY.md §2.1 rows 1-14).

The reference functions operate inside Presto SQL; here the aggregation
forms take a DataFrame + column and return either a sketch object
(ungrouped — Presto's single accumulator state) or a DataFrame of
(key, sketch) rows (grouped — Presto's grouped state,
BloomFilterStateFactory.java:48-91), and scalar forms return either
Spark Columns (row-wise) or plain Python values (filter-wise).
"""

from __future__ import annotations

import base64
import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from presto_bloomfilter_spark.functions import serialization as ser
from presto_bloomfilter_spark.functions.bloom import BloomFilter
from presto_bloomfilter_spark.operators import aggregate as agg
from presto_bloomfilter_spark.operators.probe import contains_udf
from presto_bloomfilter_spark.store import SketchStore


def _as_blob(bf) -> bytes:
    return bf.to_bytes() if hasattr(bf, "to_bytes") else bytes(bf)


# ---- aggregation functions ---------------------------------------------------


def bloom_filter(
    df: DataFrame,
    col: str,
    expected_insertions: int = BloomFilter.DEFAULT_EXPECTED_INSERTIONS,
    fpp: float = BloomFilter.DEFAULT_FPP,
    group_by: str | None = None,
    target_partials: int | None = None,
):
    """``bloom_filter(el[, n[, p]])`` aggregation (reference
    BloomFilterAggregation.java:31-62; defaults BloomFilter.java:64-65).

    Inserts each non-null, non-empty element of ``col``; returns the
    merged BloomFilter (ungrouped) or a DataFrame[group_by, sketch]
    (grouped).  Null/'' elements are silently ignored
    (BloomFilter.java:161-167).
    """
    spec = agg.bloom_over_strings(col, expected_insertions, fpp)
    if group_by is None:
        return agg.aggregate_sketch(df, spec, target_partials=target_partials)
    return agg.grouped_sketch(df, group_by, spec)


def bloom_filter_from_string(df: DataFrame, col: str) -> BloomFilter:
    """``bloom_filter_from_string(base64)`` aggregation — deserializes
    each input string and unions them (reference
    BloomFilterFromString.java:23-38).  Base64 decode happens JVM-side
    (F.unbase64); only tiny sketch blobs reach Python."""
    blobs = df.select(F.unbase64(F.col(col)).alias("sketch"))
    return agg.merge_sketch_column(blobs, "sketch")


def bloom_filter_load(source) -> BloomFilter:
    """``bloom_filter_load(url)`` aggregation — loads persisted filters
    and unions them (reference BloomFilterLoad.java:23-40 /
    BloomFilter.fromUrl BloomFilter.java:116-138).  ``source`` is one
    path or a list of paths into a sketch store directory."""
    paths = [source] if isinstance(source, (str, os.PathLike)) else list(source)
    if not paths:
        raise ValueError("no paths to load")
    out = None
    for p in paths:
        store = SketchStore(os.path.dirname(os.fspath(p)) or ".")
        key = os.path.basename(os.fspath(p)).removesuffix(".sketch")
        sk = store.get(key)
        out = sk if out is None else out.merge(sk)
    return out


# ---- scalar functions --------------------------------------------------------


def bloom_filter_contains(spark: SparkSession, bf, col) -> Column:
    """``bloom_filter_contains(bf, el)`` scalar (reference
    BloomFilterContainsScalarFunction.java:33-42): false ⇒ definitely
    absent, true ⇒ probably present; null element → false.  The filter
    rides a broadcast; probes are vectorized per Arrow batch with an
    executor-local LRU keyed by the blob's sha256 (the reference's Guava
    cache, BloomFilterScalarFunctions.java:25,46-61)."""
    c = F.col(col) if isinstance(col, str) else col
    return contains_udf(spark, bf)(c)


def to_string(bf) -> str:
    """``to_string(bf)`` scalar — base64 of the serialized filter
    (reference BloomFilterToStringScalarFunction.java:37-44)."""
    return base64.b64encode(_as_blob(bf)).decode("ascii")


def to_string_col(col) -> Column:
    """Column form of ``to_string`` over a binary sketch column — pure
    JVM, no Python round trip.  Spark's base64 emits MIME line breaks
    every 76 chars; strip them for RFC-4648 parity with to_string()."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(F.base64(c), "\r\n", "")


def get_expected_insertions(bf) -> int:
    """``get_expected_insertions(bf)`` scalar (reference
    BloomFilterGetExpectedInsertionsScalarFunction.java:36-43) — read
    from the serialized header without decoding the payload."""
    if isinstance(bf, BloomFilter):
        return bf.expected_insertions
    return int(ser.read_params(_as_blob(bf))["n"])


def get_false_positive_percentage(bf) -> float:
    """``get_false_positive_percentage(bf)`` scalar (reference
    BloomFilterGetFalsePositivePercentageScalarFunction.java:36-44)."""
    if isinstance(bf, BloomFilter):
        return bf.fpp
    return float(ser.read_params(_as_blob(bf))["p"])


def bloom_filter_persist(bf, path: str) -> bool:
    """``bloom_filter_persist(bf, url)`` scalar (reference
    BloomFilterPersistScalarFunction.java:38-63 → persist-service
    server.go:30-41): atomic write into a sketch-store directory;
    errors raise to the caller for retry."""
    store = SketchStore(os.path.dirname(path) or ".")
    key = os.path.basename(path).removesuffix(".sketch")
    return store.put(key, bf)
