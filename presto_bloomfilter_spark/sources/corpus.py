"""Deterministic synthetic corpus of pre-tokenized training sequences.

The authoritative input shape (BASELINE.json:input_hint) is an
Iceberg-style table::

    doc_id  string
    tokens  array<int32>   (not null)
    n_tok   int32
    source  string         (low-cardinality, skewed)

The driver's testdata has no such table, so we synthesize it
deterministically (fixed seed, fixed layout) at small scale for tests
and benchmarks — both the Spark queries and the DuckDB oracle read the
*same parquet file*, so correctness comparisons are exact.

Distribution choices mirror a real training corpus: Zipf token ids over
a 50k vocabulary, log-normal-ish sequence lengths, and a heavily skewed
``source`` column (web ≈ 55% of documents) — the skew is deliberate, it
is what the salted grouped aggregation (operators/aggregate.py) exists
to handle (north_rule: "salting/repartitioning for skewed sources").

At 10^12-sequence production scale this table would be an Iceberg table
read with ``spark.read.format("iceberg")``; everything downstream only
assumes the schema above.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# constants follow FIXTURES.md §F1
SEED = 42
VOCAB_SIZE = 50_257
SOURCES = ["web", "books", "code", "wiki", "forums"]
SOURCE_WEIGHTS = [0.70, 0.15, 0.08, 0.05, 0.02]
MAX_LEN = 512

DOCS_PER_SF = {
    "sf0.001": 1_000,
    "sf0.01": 10_000,
    "sf0.1": 400_000,
    # dedicated scaling-run corpora: big enough that per-core sketch
    # compute dominates fixed job overhead (~600M / ~2.4B tokens)
    "sfscale": 3_200_000,
    "sfscale4": 12_800_000,
}

# generation chunk: fixed-size numpy buffers per chunk keep peak memory
# bounded and let the allocator recycle pages (large one-shot generation
# would first-touch GBs of fresh pages, which is pathologically slow on
# memory-ballooned hosts)
CHUNK_DOCS = 100_000

# generated-corpus cache dir; env-overridable because under
# ``spark-submit --py-files pkg.zip`` the package ``__file__`` lives
# inside the zip and is not a writable directory
_REPO_DATA = os.environ.get(
    "PBS_DATA_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "data"),
)

TOKENS_SPARK_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def generate_tokens_table(n_docs: int, seed: int = SEED, start_idx: int = 0) -> pa.Table:
    """Generate one corpus chunk as an Arrow table, fully vectorized."""
    rng = np.random.default_rng(seed)
    doc_idx = np.arange(start_idx, start_idx + n_docs)
    doc_id = pa.array([f"doc-{i:012d}" for i in doc_idx], pa.string())
    source = rng.choice(np.arange(len(SOURCES)), size=n_docs, p=SOURCE_WEIGHTS)
    # sequence lengths: clipped lognormal in [1, MAX_LEN] (FIXTURES F1)
    n_tok = np.clip(rng.lognormal(5.0, 0.8, size=n_docs), 1, MAX_LEN).astype(np.int32)
    total = int(n_tok.sum())
    # Zipf token ids folded into the vocab
    flat = ((rng.zipf(1.5, size=total) - 1) % VOCAB_SIZE).astype(np.int32)
    offsets = np.zeros(n_docs + 1, dtype=np.int32)
    np.cumsum(n_tok, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat))
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": pa.array(n_tok),
            "source": pa.array([SOURCES[s] for s in source], pa.string()),
        }
    )


def tokens_parquet_path(sf_dir: str) -> str:
    """Map a testdata sf dir to this repo's deterministic tokens parquet."""
    sf = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_REPO_DATA, f"tokens_{sf}.parquet")


def ensure_tokens_parquet(sf_dir: str) -> str:
    """Generate (once) and return the tokens parquet for an sf dir."""
    sf = os.path.basename(os.path.normpath(sf_dir))
    if sf not in DOCS_PER_SF:
        raise ValueError(f"unknown scale factor dir {sf_dir}")
    path = tokens_parquet_path(sf_dir)
    if not os.path.exists(path):
        os.makedirs(_REPO_DATA, exist_ok=True)
        n = DOCS_PER_SF[sf]
        tmp = path + ".tmp"
        writer = None
        try:
            for start in range(0, n, CHUNK_DOCS):
                cnt = min(CHUNK_DOCS, n - start)
                # per-chunk seed keeps chunks independent + deterministic
                tbl = generate_tokens_table(cnt, SEED + start, start)
                if writer is None:
                    # small row groups: parquet scans can only split on
                    # row-group boundaries, so this sets the max scan
                    # parallelism (98 groups at sf0.1 keeps local[32]
                    # fed; at production scale the equivalent knob is
                    # many ~128MB files)
                    writer = pq.ParquetWriter(tmp, tbl.schema)
                writer.write_table(tbl, row_group_size=1024)
        finally:
            if writer is not None:
                writer.close()
        os.replace(tmp, path)  # atomic publish
    return path


def load_tokens(spark, sf_dir: str, n_partitions: int | None = None):
    """Load the tokens table as a Spark DataFrame."""
    path = ensure_tokens_parquet(sf_dir)
    df = spark.read.parquet(path)
    if n_partitions:
        df = df.repartition(n_partitions)
    return df
