"""Benchmark harness.

Runs the headline sketch queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and
prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "tokens_per_sec": ...,
     "scaling": {...}}

With SPARK_GRAFT_SCALING=1 (or --scaling) it additionally runs the
core token-sketch build at two parallelism levels (local[8] vs
local[32] — the in-sandbox stand-in for N vs 4N executors, per the
driver instruction) and reports throughput at both plus scaling
efficiency; the same numbers are appended to BENCH_SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(_REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"pbs-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        # tokens parquet is one file: split it so every core gets scan work
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def bench_queries(spark, sf_dir: str) -> tuple[dict, int]:
    """Headline queries; returns (name→sec, total_tokens)."""
    from pyspark.sql import functions as F

    from presto_bloomfilter_spark.operators import aggregate as agg
    from presto_bloomfilter_spark.plans import queries as Q
    from presto_bloomfilter_spark.sources.corpus import load_tokens

    tokens = load_tokens(spark, sf_dir)
    total_tokens = tokens.agg(F.sum("n_tok")).collect()[0][0]

    timings = {}

    def run(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    run("bloom_build_tokens", lambda: agg.aggregate_sketch(
        tokens, agg.bloom_over_tokens("tokens", 10_000_000, 0.01)))
    run("hll_tokens_by_source", lambda: agg.grouped_sketch(
        tokens, "source", agg.hll_over_tokens("tokens"), salt=8).collect())
    run("cms_build_tokens", lambda: agg.aggregate_sketch(
        tokens, agg.cms_over_tokens("tokens", eps=1e-4)))
    run("kll_ntok", lambda: agg.aggregate_sketch(
        tokens, agg.kll_over_column("n_tok")))
    run("bloom_semijoin", lambda: Q.q_bloom_semijoin(spark, sf_dir).collect())
    run("hll_docs_by_source", lambda: Q.q_hll_docs_by_source(spark, sf_dir).collect())
    return timings, int(total_tokens)


def scaling_run(sf_dir: str) -> dict:
    """Same token-sketch build at local[8] vs local[32]; efficiency =
    (throughput_32 / throughput_8) / 4."""
    from pyspark.sql import functions as F

    from presto_bloomfilter_spark.operators import aggregate as agg
    from presto_bloomfilter_spark.sources.corpus import load_tokens

    results = {}
    for cpus in (8, 32):
        spark = make_spark(cpus)
        try:
            tokens = load_tokens(spark, sf_dir)
            total = tokens.agg(F.sum("n_tok")).collect()[0][0]
            # warm the JVM/scan path once
            agg.aggregate_sketch(tokens, agg.hll_over_tokens("tokens"))
            t0 = time.time()
            agg.aggregate_sketch(tokens, agg.bloom_over_tokens("tokens", 10_000_000, 0.01))
            agg.aggregate_sketch(tokens, agg.cms_over_tokens("tokens", eps=1e-4))
            dt = time.time() - t0
            results[cpus] = {"sec": round(dt, 3), "tokens_per_sec": round(2 * total / dt)}
        finally:
            spark.stop()
    eff = (results[32]["tokens_per_sec"] / results[8]["tokens_per_sec"]) / 4.0
    out = {
        "local8": results[8],
        "local32": results[32],
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    md = (
        "# BENCH_SCALING — throughput at two parallelism levels\n\n"
        "In-sandbox stand-in for N vs 4N executors (north_rule): the same\n"
        "bloom+CMS token-sketch build over the same input at local[8] vs local[32].\n\n"
        f"| parallelism | wall sec | tokens/sec |\n|---|---|---|\n"
        f"| local[8] | {results[8]['sec']} | {results[8]['tokens_per_sec']:,} |\n"
        f"| local[32] | {results[32]['sec']} | {results[32]['tokens_per_sec']:,} |\n\n"
        f"**Scaling efficiency (8→32 cores, ideal 4.0x): "
        f"{out['scaling_efficiency_8_to_32']:.3f}** (target ≥ 0.8)\n"
    )
    (_REPO / "BENCH_SCALING.md").write_text(md)
    return out


def main() -> None:
    do_scaling = os.environ.get("SPARK_GRAFT_SCALING") == "1" or "--scaling" in sys.argv

    spark = make_spark(CPUS)
    try:
        t0 = time.time()
        timings, total_tokens = bench_queries(spark, SF_DIR)
        total = round(time.time() - t0, 3)
    finally:
        spark.stop()

    build_sec = timings["bloom_build_tokens"]
    result = {
        "metric": "sketch_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "total_tokens": total_tokens,
        "tokens_per_sec": round(total_tokens / build_sec) if build_sec else None,
    }
    if do_scaling:
        result["scaling"] = scaling_run(SF_DIR)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
