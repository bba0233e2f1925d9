"""Similarity search over embedding columns (array<float>).

Three shapes, as the task demands at 100 TB:

- brute-force cosine top-k (``cosine_topk``): queries broadcast as one
  numpy matrix; a mapInPandas pass computes per-partition top-k with
  one BLAS matmul per batch, then a tiny global reduce picks the final
  top-k.  Shuffle volume is O(n_queries * k) rows regardless of corpus
  size — this is the exact baseline;
- exact all-pairs near-dup (``embedding_near_dup_pairs``): block-pair
  join — every unordered block pair becomes one task that multiplies
  its two sub-matrices.  Fully distributed (the corpus NEVER collects
  to the driver), shuffle volume O(n * n_blocks) rows, compute the
  unavoidable O(n^2) spread over n_blocks^2/2 tasks.  This is the
  distributed-matmul shape of exact pairwise similarity;
- ANN (``ivf_topk`` / ``lsh_topk``): ONE map-only Spark job for any
  number of queries — each scan partition assigns its rows to an
  IVF list / LSH bucket, probes only the queries whose probe set
  covers that cell, and emits per-partition top-k; a final window
  keeps the global top-k.  With a materialized index table
  (``ivf_assign`` written partitioned-by(list_id),
  ``hyperplane_lsh_buckets`` written bucketed-by(bucket)) the same
  probe runs as a partition-pruned scan instead.

Recall of the approximate paths is measured against the brute-force
baseline in tests, never assumed.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _to_matrix(series: pd.Series) -> np.ndarray:
    return np.stack(series.to_numpy()).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def cosine_topk(
    spark: SparkSession,
    base: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, rank).

    rank is 1-based by (cosine desc, neighbor_id asc) — returning the
    deterministic rank rather than the float similarity keeps results
    engine-comparable.
    """
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = _normalize(np.array([q[1] for q in queries], dtype=np.float64))
    bq = spark.sparkContext.broadcast((qids, qmat))

    def partial_topk(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qmat_ = bq.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            base_ids = pdf[id_col].to_numpy()
            bm = _normalize(_to_matrix(pdf[vec_col]))
            sims = qmat_ @ bm.T  # (n_queries, batch)
            if exclude_self:
                mask = base_ids[None, :] == qids_[:, None]
                sims[mask] = -np.inf
            kk = min(k, sims.shape[1])
            # per-query local top-k (argpartition = O(batch))
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = np.repeat(np.arange(len(qids_)), kk)
            cols = part.ravel()
            yield pd.DataFrame(
                {
                    "query_id": qids_[rows],
                    "neighbor_id": base_ids[cols],
                    "sim": sims[rows, cols],
                }
            )

    partials = base.select(id_col, vec_col).mapInPandas(
        partial_topk, "query_id long, neighbor_id long, sim double"
    )
    return _rank_topk(partials, k)


def _rank_topk(partials: DataFrame, k: int) -> DataFrame:
    """Global top-k per query over per-partition partials: the final
    (tiny — partitions x queries x k rows) window reduce."""
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


# ---- exact all-pairs near-dup -------------------------------------------------


def embedding_near_dup_pairs(
    spark: SparkSession,
    df: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_rows: int = 100_000,
    n_blocks: int | None = None,
    approx_rows: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b), id_a < id_b,
    cosine >= threshold — EXACT, fully distributed.

    Block-pair join: rows hash into ``n_blocks`` blocks; every unordered
    block pair (i <= j) is one applyInPandas group holding blocks i and
    j, which multiplies the two normalized sub-matrices with one BLAS
    call and emits qualifying pairs.  The corpus never collects to the
    driver; each row is shuffled n_blocks times (O(n * n_blocks) rows
    total) and each of the n_blocks*(n_blocks+1)/2 tasks holds at most
    2 * n/n_blocks rows — the standard distributed shape of an exact
    pairwise similarity (an O(n^2) computation by definition; at corpus
    scale use the LSH-bucketed candidate path in
    ``hyperplane_lsh_buckets`` + a per-bucket verify when approximate
    recall is acceptable).

    ``n_blocks`` defaults to
    max(ceil(sqrt(2 * defaultParallelism)), ceil(rows / block_rows)) —
    enough pair-groups to cover the cluster AND at most ``block_rows``
    rows per block, so a task's gathered vectors are bounded no matter
    the corpus size.  The row term uses ``approx_rows`` when given
    (any cheap estimate: catalog stats, a prior count, the write-side
    row count — keeps the query ONE job); otherwise it falls back to
    one ``df.count()`` (metadata-only on a plain parquet scan) rather
    than silently dropping the per-task memory bound.  Pass
    ``n_blocks`` outright to skip both.  Inside each task the
    similarity matmul is additionally chunked so the transient scores
    buffer stays bounded (~256 MB) even when a block is oversized.
    """
    if n_blocks is None:
        p = spark.sparkContext.defaultParallelism
        if approx_rows is None:
            approx_rows = df.count()
        n_blocks = max(int(math.ceil(math.sqrt(2.0 * p))),
                       int(math.ceil(approx_rows / float(block_rows))), 1)
    blocks = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")
    ).withColumn("b", F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)).cast("int"))
    other = spark.range(n_blocks).select(F.col("id").cast("int").alias("o"))
    rep = blocks.crossJoin(F.broadcast(other)).select(
        "id",
        "v",
        "b",
        F.least(F.col("b"), F.col("o")).alias("pi"),
        F.greatest(F.col("b"), F.col("o")).alias("pj"),
    )

    # transient scores-buffer cap: 32M float64 elements ≈ 256 MB; the
    # A side of each matmul is chunked to stay under it, so an
    # oversized block degrades to more (bounded) matmul calls instead
    # of one task-killing allocation
    sims_elems_cap = 32_000_000

    def _pairs_chunked(am, bm, aid, bid, same_block):
        chunk = max(1, sims_elems_cap // max(len(bm), 1))
        out_a, out_b = [], []
        for s in range(0, len(am), chunk):
            sims = am[s : s + chunk] @ bm.T
            mask = sims >= threshold
            if same_block:
                mask &= aid[s : s + chunk, None] < bid[None, :]
            ia, ib = np.nonzero(mask)
            out_a.append(aid[s + ia])
            out_b.append(bid[ib])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        return a, b

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        pi = int(pdf["pi"].iat[0])
        pj = int(pdf["pj"].iat[0])
        ids = pdf["id"].to_numpy(dtype=np.int64)
        mat = _normalize(_to_matrix(pdf["v"]))
        if pi == pj:
            a, b = _pairs_chunked(mat, mat, ids, ids, same_block=True)
            return pd.DataFrame({"id_a": a, "id_b": b})
        side_a = pdf["b"].to_numpy() == pi
        am, bm = mat[side_a], mat[~side_a]
        aid, bid = ids[side_a], ids[~side_a]
        if not len(am) or not len(bm):
            return pd.DataFrame({"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64)})
        a, b = _pairs_chunked(am, bm, aid, bid, same_block=False)
        return pd.DataFrame({"id_a": np.minimum(a, b), "id_b": np.maximum(a, b)})

    return rep.groupBy("pi", "pj").applyInPandas(verify, "id_a long, id_b long")


def embedding_near_dup_pairs_lsh(
    spark: SparkSession,
    df: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    n_tables: int = 4,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Approximate near-dup pairs: candidates share a hyperplane-LSH
    bucket in ANY of ``n_tables`` independent tables, then an exact
    cosine verify keeps pairs >= threshold.  Output is a SUBSET of
    ``embedding_near_dup_pairs`` (no false positives after verify;
    recall measured in tests) with shuffle keyed on uniform bucket
    hashes — the practical 100 TB path, O(n * n_tables) shuffle instead
    of O(n * n_blocks) with quadratic verify work only inside buckets.

    ``dim`` defaults to the corpus's embedding dimension (read from one
    row) — hyperplanes must match it or every batch fails the matmul.
    """
    if dim is None:
        first = df.select(vec_col).first()
        dim = len(first[0])
    idx = None
    for t in range(n_tables):
        b = hyperplane_lsh_buckets(df, bits=bits, dim=dim, seed=seed + 101 * t,
                                   vec_col=vec_col, id_col=id_col)
        b = b.select("id", "bucket", F.lit(t).alias("table"))
        idx = b if idx is None else idx.unionAll(b)
    a, bb = idx.alias("a"), idx.alias("b")
    cands = (
        a.join(
            bb,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    vecs = df.select(F.col(id_col).cast("long").alias("__vid"), F.col(vec_col).alias("__v"))
    joined = (
        cands.join(vecs.withColumnRenamed("__vid", "id_a").withColumnRenamed("__v", "va"), "id_a")
        .join(vecs.withColumnRenamed("__vid", "id_b").withColumnRenamed("__v", "vb"), "id_b")
    )

    def verify(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            va = _normalize(_to_matrix(pdf["va"]))
            vb = _normalize(_to_matrix(pdf["vb"]))
            sims = np.einsum("ij,ij->i", va, vb)
            out = pdf[["id_a", "id_b"]][sims >= threshold]
            yield out

    return joined.mapInPandas(verify, "id_a long, id_b long")


def semantic_dedup(
    spark: SparkSession,
    df: DataFrame,
    threshold: float,
    n_clusters: int | None = None,
    centroids: np.ndarray | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed_strategy: str = "kmeans",
    sample_rows: int = 20_000,
    chunk_rows: int = 4096,
    max_cluster_rows: int = 500_000,
) -> DataFrame:
    """SemDeDup-shape semantic deduplication (Abbas, Tirumala, Simig,
    Ganguli & Morcos, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication", arXiv:2303.09540): cluster the
    embedding space coarsely, then compare pairs ONLY within a cluster
    — O(sum of cluster-size^2) instead of O(n^2), the published trade
    for corpus-scale semantic dedup.

    Keep rule (deterministic, engine-portable): a row is dropped iff
    SOME other row in its cluster with a SMALLER id has cosine >=
    ``threshold`` to it — i.e. each near-dup neighborhood keeps its
    lowest id.  (Neighborhood-based, not transitive-chain-based: x is
    judged against all smaller-id cluster members, dropped or not —
    this is what makes the rule order-independent and expressible in
    one SQL EXISTS for the cross-engine gate.)

    Clustering: ``centroids`` (normalized, from spherical_kmeans over a
    sample) when given; else ``seed_strategy``:
    - ``"kmeans"`` (default, the quality path): spherical k-means over
      a bounded driver-side sample, like the IVF coarse quantizer;
    - ``"first"``: the ``n_clusters`` smallest-id rows' embeddings are
      the seeds — fully deterministic AND recomputable in pure SQL,
      which is what the correctness gate uses.
    Assignment = nearest centroid by cosine, ties to the lowest
    centroid index (np.argmax / ROW_NUMBER agree).

    Dataflow: assignment is map-only; the pair phase shuffles rows
    once on cluster_id and each cluster runs one chunked BLAS matmul
    (never materializing the full cluster Gram matrix).  A cluster
    larger than ``max_cluster_rows`` fails loud — at that size the
    clustering is too coarse and n_clusters should grow (the paper
    uses n_clusters ~ sqrt(n), our default).

    Output: (id_col, cluster_id long, kept boolean) — one row per
    input row; filter kept to materialize the deduplicated corpus.
    """
    if seed_strategy not in ("kmeans", "first"):
        raise ValueError(f"unknown seed_strategy {seed_strategy!r}")
    if centroids is None:
        if n_clusters is None:
            n_clusters = max(1, int(math.sqrt(df.count())))
        if seed_strategy == "first":
            seed_rows = (df.select(id_col, vec_col)
                         .orderBy(id_col).limit(n_clusters).collect())
            centroids = _normalize(np.array(
                [r[vec_col] for r in seed_rows], dtype=np.float64))
        else:
            from presto_bloomfilter_spark.operators.sampling import md5_bucket

            frac_buckets = 10_000
            sample = (df.select(id_col, vec_col)
                      .withColumn("__b", md5_bucket(id_col, frac_buckets)))
            # bounded driver sample, hash-deterministic like the IVF path
            n_total = df.count()
            keep = min(frac_buckets,
                       max(1, int(frac_buckets * sample_rows / max(n_total, 1))))
            mat = _to_matrix(pd.Series(
                [r[vec_col] for r in
                 sample.filter(F.col("__b") < keep).limit(sample_rows).collect()]))
            centroids = spherical_kmeans(mat, n_clusters)
    cent = np.ascontiguousarray(centroids, dtype=np.float64)

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            m = _normalize(_to_matrix(pdf[vec_col]))
            yield pd.DataFrame({
                "id": pdf[id_col],
                "cluster_id": np.argmax(m @ cent.T, axis=1).astype(np.int64),
                "v": pdf[vec_col],
            })

    id_type = df.schema[id_col].dataType.simpleString()
    assigned = df.select(id_col, vec_col).mapInPandas(
        assign, f"id {id_type}, cluster_id long, v array<float>")

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_cluster_rows:
            raise ValueError(
                f"cluster {int(pdf['cluster_id'].iloc[0])} has "
                f"{len(pdf)} rows > max_cluster_rows={max_cluster_rows}; "
                "increase n_clusters (SemDeDup wants ~sqrt(n)) or raise "
                "the cap")
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        m = _normalize(_to_matrix(pdf["v"]))
        n = len(pdf)
        dropped = np.zeros(n, dtype=bool)
        for a in range(0, n, chunk_rows):
            b = min(a + chunk_rows, n)
            sims = m[a:b] @ m.T  # (b-a, n)
            hit = sims >= threshold
            # only SMALLER-id columns count: global column index < row's
            cols = np.arange(n)[None, :] < np.arange(a, b)[:, None]
            dropped[a:b] = (hit & cols).any(axis=1)
        return pd.DataFrame({"id": pdf["id"], "cluster_id": pdf["cluster_id"],
                             "kept": ~dropped})

    return (assigned.groupBy("cluster_id")
            .applyInPandas(per_cluster,
                           f"id {id_type}, cluster_id long, kept boolean")
            .withColumnRenamed("id", id_col))


# ---- index builders -----------------------------------------------------------


def hyperplane_lsh_buckets(
    df: DataFrame,
    bits: int = 12,
    dim: int = 64,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, bucket) via random-hyperplane signs — cosine-LSH index.
    At scale this DataFrame is written bucketed-by(bucket) so probes
    are partition-pruned scans."""
    planes = _lsh_planes(dim, bits, seed)
    weights = _bucket_weights(bits)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = _to_matrix(pdf[vec_col])
            buckets = ((m @ planes) > 0).astype(np.int64) @ weights
            yield pd.DataFrame({"id": pdf[id_col].astype(np.int64), "bucket": buckets})

    return df.select(id_col, vec_col).mapInPandas(fn, "id long, bucket long")


# the one place the adaptive dials live — the docstrings below invite
# tuning them, so every probe path must read them from here
_DEFAULT_PROBE_RADIUS = 2
_NPROBE_FRACTION = 0.6


def default_nprobe(n_lists: int) -> int:
    """nprobe for a given list count under the adaptive recall target."""
    return max(1, int(math.ceil(_NPROBE_FRACTION * n_lists)))


def adaptive_lsh_params(n_rows: int, target_bucket_rows: int = 64) -> tuple[int, int]:
    """Corpus-size-derived multi-probe LSH defaults: (bits, probe_radius).

    ``bits ≈ log2(n / target_bucket_rows)`` keeps the expected bucket
    occupancy near ``target_bucket_rows`` whatever the corpus size — the
    same sizing-from-data posture as the reference's
    bloom_filter(el, n, p) (BloomFilterAggregation.java:41-62), where
    geometry derives from expected insertions rather than being a fixed
    constant the user must re-tune per corpus.  probe_radius=2 probes
    1 + bits + bits*(bits-1)/2 of the 2^bits buckets — on clustered
    embeddings most of a query's true neighbors share its bucket, and
    on adversarially-uniform data (the synthetic test corpus) the
    coverage fraction itself floors the recall.  Raise
    ``target_bucket_rows`` for more recall, lower it for more pruning.
    """
    bits = int(round(math.log2(max(n_rows, 2) / float(target_bucket_rows))))
    return max(1, min(bits, 24)), _DEFAULT_PROBE_RADIUS


def adaptive_ivf_params(n_rows: int) -> tuple[int, int]:
    """Corpus-size-derived IVF defaults: (n_lists, nprobe).

    ``n_lists ≈ sqrt(n)`` balances quantizer cost against list length
    (the standard IVF sizing); ``nprobe = ceil(0.6 * n_lists)`` targets
    recall@10 ≥ 0.6 even on uniform-random embeddings, where recall is
    floored by the scanned fraction — clustered real corpora reach the
    same recall at much smaller nprobe, so treat this as the safe
    default and dial nprobe down once measured recall allows."""
    n_lists = max(4, min(int(round(math.sqrt(max(n_rows, 16)))), 4096))
    return n_lists, default_nprobe(n_lists)


def _lsh_planes(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, bits))


def _bucket_weights(bits: int) -> np.ndarray:
    return (np.uint64(1) << np.arange(bits, dtype=np.uint64)).astype(np.int64)


def spherical_kmeans(mat: np.ndarray, n_lists: int, iters: int = 10,
                     seed: int = 7) -> np.ndarray:
    """Deterministic spherical k-means over a normalized sample; returns
    (n_lists, dim) normalized centroids.  Runs on the driver over a
    bounded sample — the coarse quantizer of an IVF index, not a
    full-corpus clustering."""
    rng = np.random.default_rng(seed)
    mat = _normalize(mat)
    cent = mat[rng.choice(len(mat), size=min(n_lists, len(mat)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for j in range(len(cent)):
            members = mat[assign == j]
            if len(members):
                cent[j] = members.sum(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_assign(df: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """(id, list_id): nearest-centroid assignment — the IVF inverted
    lists.  At scale this DataFrame is written partitioned-by(list_id)
    so probes are partition-pruned scans (same posture as the LSH
    bucket table)."""
    cent = centroids.copy()

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = _normalize(_to_matrix(pdf[vec_col]))
            assign = np.argmax(m @ cent.T, axis=1)
            yield pd.DataFrame({"id": pdf[id_col].astype(np.int64),
                                "list_id": assign.astype(np.int64)})

    return df.select(id_col, vec_col).mapInPandas(fn, "id long, list_id long")


# ---- single-job ANN -----------------------------------------------------------


def _fused_ann_topk(
    spark: SparkSession,
    base: DataFrame,
    probe_sets: list[tuple[int, np.ndarray, np.ndarray]],
    assign_fn,
    k: int,
    vec_col: str,
    id_col: str,
    cell_col: str | None = None,
) -> DataFrame:
    """ONE map-only job for Q queries: each scan partition assigns its
    rows to index cells (``assign_fn``, or reads them from ``cell_col``
    of a materialized index), intersects with every query's probe
    cells, and emits that query's per-partition BLAS top-k.  The only
    shuffle is the final window over partitions x Q x k rows.

    ``probe_sets``: (query_id, normalized qvec, probed cell ids) per
    query.  With a pre-materialized index table the same probe becomes
    a partition-pruned scan (see ivf_topk_indexed); this fused form
    computes assignments on the fly so Q queries cost one corpus scan,
    not Q.
    """
    bq = spark.sparkContext.broadcast(probe_sets)
    cols = [id_col, vec_col] + ([cell_col] if cell_col else [])

    def partial(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        probes = bq.value
        for pdf in it:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            m = _normalize(_to_matrix(pdf[vec_col]))
            cells = (
                pdf[cell_col].to_numpy(dtype=np.int64) if cell_col else assign_fn(m)
            )
            frames = []
            for qid, qv, probe in probes:
                mask = np.isin(cells, probe) & (ids != qid)
                if not mask.any():
                    continue
                sims = m[mask] @ qv
                kk = min(k, sims.size)
                sel = np.argpartition(-sims, kk - 1)[:kk] if sims.size > kk else np.arange(sims.size)
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": ids[mask][sel],
                            "sim": sims[sel],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames)

    partials = base.select(*cols).mapInPandas(
        partial, "query_id long, neighbor_id long, sim double"
    )
    return _rank_topk(partials, k)


def write_ivf_index(df: DataFrame, centroids: np.ndarray, path: str,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    mode: str = "overwrite") -> None:
    """Materialize the IVF index: (id, vector, list_id) parquet table
    PARTITIONED BY list_id — the probe side then reads only the nprobe
    matching directories (partition pruning at the scan, asserted in
    tests), which is how the index survives 100 TB: probe cost tracks
    nprobe/n_lists of the corpus, not the corpus.

    One mapInPandas pass carries the vector alongside its assignment
    (no post-hoc self-join against ivf_assign)."""
    cent = centroids.copy()

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            m = _normalize(_to_matrix(pdf[vec_col]))
            out = pdf[[id_col, vec_col]].copy()
            out["list_id"] = np.argmax(m @ cent.T, axis=1).astype(np.int64)
            yield out

    assigned = df.select(id_col, vec_col).mapInPandas(
        fn, f"{id_col} long, {vec_col} array<float>, list_id long"
    )
    assigned.write.mode(mode).partitionBy("list_id").parquet(path)
    _write_index_meta(df.sparkSession, path,
                      {"kind": "ivf", "n_lists": int(len(cent)),
                       "centroids": [[float(x) for x in c] for c in cent]})


def ivf_topk_indexed(
    spark: SparkSession,
    index_path: str,
    queries: list[tuple[int, list[float]]],
    centroids: np.ndarray | None = None,
    k: int = 10,
    nprobe: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN probe against a MATERIALIZED index (write_ivf_index): the
    scan reads only the union of all queries' nprobe lists via
    partition pruning — `.explain` shows the list_id PartitionFilters —
    then one map-only pass computes per-partition top-k per query.
    Same output shape and assignment rule as ivf_topk.  ``centroids``
    defaults to the quantizer the index build recorded in its
    ``_pbs_meta`` sidecar; ``nprobe`` defaults to the adaptive
    0.6*n_lists rule."""
    if centroids is None:
        meta = read_index_meta(spark, index_path)
        centroids = np.asarray(meta["centroids"], dtype=np.float64)
    if nprobe is None:
        nprobe = default_nprobe(len(centroids))
    qids = [int(q[0]) for q in queries]
    qmat = _normalize(np.array([q[1] for q in queries], dtype=np.float64))
    qlists = np.argsort(-(qmat @ centroids.T), axis=1)[:, :nprobe]
    probe_sets = [
        (qid, qv, probe.astype(np.int64)) for qid, qv, probe in zip(qids, qmat, qlists)
    ]
    probed_lists = sorted({int(x) for probe in qlists for x in probe})
    pruned = spark.read.parquet(index_path).filter(
        F.col("list_id").isin(probed_lists)
    )
    return _fused_ann_topk(
        spark, pruned, probe_sets, None, k, vec_col, id_col, cell_col="list_id"
    )


def ivf_topk(
    spark: SparkSession,
    base: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    n_lists: int | None = None,
    nprobe: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    train_sample: int = 4096,
    approx_rows: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: spherical-kmeans coarse quantizer, search
    only the ``nprobe`` inverted lists nearest each query.  Same output
    shape as cosine_topk; recall vs the exact baseline is a measured
    property (tests), not a promise.

    ``n_lists``/``nprobe`` default to ``adaptive_ivf_params`` over the
    corpus row count (``approx_rows`` when given, else one
    metadata-only ``base.count()``): n_lists ≈ sqrt(n) tracks the
    corpus instead of being a per-scale constant.

    All queries run in ONE map-only Spark job (see _fused_ann_topk);
    candidate set ≈ nprobe/n_lists of the corpus per query.  To amortize
    the quantizer across many query batches, materialize ``ivf_assign``
    partitioned-by(list_id) and probe that table instead.
    """
    if n_lists is None:
        n = approx_rows if approx_rows is not None else base.count()
        n_lists, _ = adaptive_ivf_params(n)
    if nprobe is None:
        nprobe = default_nprobe(n_lists)
    sample_rows = (
        base.select(id_col, vec_col).orderBy(F.col(id_col)).limit(train_sample).collect()
    )
    smat = np.array([r[1] for r in sample_rows], dtype=np.float64)
    cent = spherical_kmeans(smat, n_lists, seed=seed)

    qids = [int(q[0]) for q in queries]
    qmat = _normalize(np.array([q[1] for q in queries], dtype=np.float64))
    qlists = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    probe_sets = [
        (qid, qv, probe.astype(np.int64)) for qid, qv, probe in zip(qids, qmat, qlists)
    ]

    def assign(m: np.ndarray) -> np.ndarray:
        return np.argmax(m @ cent.T, axis=1).astype(np.int64)

    return _fused_ann_topk(spark, base, probe_sets, assign, k, vec_col, id_col)


def _lsh_probe_sets(
    queries: list[tuple[int, list[float]]],
    planes: np.ndarray,
    weights: np.ndarray,
    bits: int,
    probe_radius: int,
) -> list[tuple[int, np.ndarray, np.ndarray]]:
    """Per-query (query_id, normalized qvec, probed buckets): the query's
    own bucket plus every bucket within Hamming distance
    ``probe_radius`` (multi-probe LSH) — shared by the fused single-job
    probe and the materialized-index probe so both search the identical
    candidate set."""
    qids = [int(q[0]) for q in queries]
    qraw = np.array([q[1] for q in queries], dtype=np.float64)
    qmat = _normalize(qraw)
    qbuckets = ((qraw @ planes) > 0).astype(np.int64) @ weights

    def probe_set(b: int) -> np.ndarray:
        out = {b}
        frontier = {b}
        for _ in range(probe_radius):
            frontier = {x ^ (1 << i) for x in frontier for i in range(bits)}
            out |= frontier
        return np.array(sorted(out), dtype=np.int64)

    return [(qid, qv, probe_set(int(b))) for qid, qv, b in zip(qids, qmat, qbuckets)]


def lsh_topk(
    spark: SparkSession,
    base: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    bits: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    probe_radius: int | None = None,
    approx_rows: int | None = None,
) -> DataFrame:
    """Approximate top-k: brute force restricted to the query's LSH
    bucket plus all buckets within Hamming distance ``probe_radius``
    (multi-probe LSH — recovers most of the recall a single-bucket probe
    loses on near-orthogonal data).  Same output shape as cosine_topk;
    recall vs exact is a measured property (tests), not a promise.

    ``bits``/``probe_radius`` default to ``adaptive_lsh_params`` over
    the corpus row count (``approx_rows`` when given — catalog stats, a
    prior count — else one metadata-only ``base.count()``): geometry
    derives from the data, so the same call works at sf0.001 and at
    corpus scale without per-scale re-tuning.

    All queries run in ONE map-only Spark job (see _fused_ann_topk);
    each query's candidate set is 1 + bits (at radius 1) of the 2^bits
    buckets.  For a standing corpus, materialize the index once with
    ``write_lsh_index`` and probe it with ``lsh_topk_indexed`` — a
    partition-pruned scan instead of a full-corpus pass."""
    if bits is None:
        n = approx_rows if approx_rows is not None else base.count()
        bits, _ = adaptive_lsh_params(n)
    if probe_radius is None:
        probe_radius = _DEFAULT_PROBE_RADIUS
    dim = len(queries[0][1])
    planes = _lsh_planes(dim, bits, seed)
    weights = _bucket_weights(bits)
    probe_sets = _lsh_probe_sets(queries, planes, weights, bits, probe_radius)

    def assign(m: np.ndarray) -> np.ndarray:
        return ((m @ planes) > 0).astype(np.int64) @ weights

    return _fused_ann_topk(spark, base, probe_sets, assign, k, vec_col, id_col)


def _write_index_meta(spark: SparkSession, path: str, meta: dict) -> None:
    """Persist index parameters as a one-row JSON table under
    ``<path>/_pbs_meta`` (underscore-prefixed → invisible to the parquet
    scan, like _SUCCESS).  Written through Spark so it lands on whatever
    filesystem the index itself uses."""
    import json as _json

    (spark.createDataFrame([(_json.dumps(meta, sort_keys=True),)], "meta string")
     .coalesce(1).write.mode("overwrite").json(path + "/_pbs_meta"))


def read_index_meta(spark: SparkSession, path: str) -> dict:
    """Load the parameters a write_*_index call recorded alongside the
    index, so probes never have to re-specify (and can never mismatch)
    the build-time geometry."""
    import json as _json

    rows = spark.read.json(path + "/_pbs_meta").collect()
    if not rows:
        raise ValueError(f"no index metadata under {path}/_pbs_meta")
    return _json.loads(rows[0].meta)


def write_lsh_index(
    df: DataFrame,
    path: str,
    bits: int | None = None,
    dim: int | None = None,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
    approx_rows: int | None = None,
) -> None:
    """Materialize the LSH index: (id, vector, bucket) parquet table
    PARTITIONED BY bucket — the probe side then reads only the probed
    buckets' directories (partition pruning at the scan, asserted in
    tests), the same posture as write_ivf_index: probe cost tracks
    probed-buckets/2^bits of the corpus, not the corpus.

    One mapInPandas pass carries the vector alongside its bucket (no
    post-hoc self-join against hyperplane_lsh_buckets).  ``bits``
    defaults to ``adaptive_lsh_params`` over the corpus row count; the
    chosen (bits, seed, dim) are recorded in a ``_pbs_meta`` sidecar so
    ``lsh_topk_indexed`` probes with the exact build geometry without
    the caller re-specifying it."""
    if dim is None:
        first = df.select(vec_col).first()
        if first is None:
            raise ValueError(
                "write_lsh_index: input DataFrame is empty and dim was "
                "not given — pass dim= to index an (initially) empty "
                "corpus")
        dim = len(first[0])
    if bits is None:
        n = approx_rows if approx_rows is not None else df.count()
        bits, _ = adaptive_lsh_params(n)
    planes = _lsh_planes(dim, bits, seed)
    weights = _bucket_weights(bits)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            m = _to_matrix(pdf[vec_col])
            out = pdf[[id_col, vec_col]].copy()
            out["bucket"] = ((m @ planes) > 0).astype(np.int64) @ weights
            yield out

    assigned = df.select(id_col, vec_col).mapInPandas(
        fn, f"{id_col} long, {vec_col} array<float>, bucket long"
    )
    assigned.write.mode(mode).partitionBy("bucket").parquet(path)
    _write_index_meta(df.sparkSession, path,
                      {"kind": "lsh", "bits": bits, "seed": seed, "dim": dim})


def lsh_topk_indexed(
    spark: SparkSession,
    index_path: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    bits: int | None = None,
    seed: int | None = None,
    probe_radius: int = _DEFAULT_PROBE_RADIUS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN probe against a MATERIALIZED index (write_lsh_index): the
    scan reads only the union of all queries' probed buckets via
    partition pruning — `.explain` shows the bucket PartitionFilters —
    then one map-only pass computes per-partition top-k per query.
    Same probe-set construction as lsh_topk, so the two return the
    same candidates.  ``bits``/``seed`` default to the values the index
    build recorded in its ``_pbs_meta`` sidecar — the probe can't
    silently mismatch the build geometry."""
    if bits is None or seed is None:
        meta = read_index_meta(spark, index_path)
        bits = meta["bits"] if bits is None else bits
        seed = meta["seed"] if seed is None else seed
    dim = len(queries[0][1])
    planes = _lsh_planes(dim, bits, seed)
    weights = _bucket_weights(bits)
    probe_sets = _lsh_probe_sets(queries, planes, weights, bits, probe_radius)
    probed_buckets = sorted({int(x) for _, _, probe in probe_sets for x in probe})
    pruned = spark.read.parquet(index_path).filter(
        F.col("bucket").isin(probed_buckets)
    )
    return _fused_ann_topk(
        spark, pruned, probe_sets, None, k, vec_col, id_col, cell_col="bucket"
    )


# ---- product quantization (PQ) --------------------------------------------------


class PQCodebook:
    """Product-quantization codebook: the vector space split into ``m``
    subspaces, each quantized by its own ``ksub``-centroid codebook.
    A vector compresses to m uint8 codes — for dim=768 float32 that is
    3072 → 8-16 bytes (~200-400x), which is what lets a 10^12-vector
    corpus keep its ANN representation scan-resident instead of
    re-reading full embeddings per query.

    ``centroids``: float32 array (m, ksub, dsub) over NORMALIZED input
    vectors, so inner-product tables approximate cosine."""

    def __init__(self, centroids: np.ndarray):
        c = np.asarray(centroids, dtype=np.float32)
        if c.ndim != 3:
            raise ValueError(f"centroids must be (m, ksub, dsub), got {c.shape}")
        if c.shape[1] > 256:
            raise ValueError("ksub > 256 does not fit uint8 codes")
        self.centroids = c

    @property
    def m(self) -> int:
        return self.centroids.shape[0]

    @property
    def ksub(self) -> int:
        return self.centroids.shape[1]

    @property
    def dim(self) -> int:
        return self.centroids.shape[0] * self.centroids.shape[2]

    def to_bytes(self) -> bytes:
        import struct

        m, ksub, dsub = self.centroids.shape
        return struct.pack(">4sIII", b"PBPQ", m, ksub, dsub) + \
            self.centroids.astype(">f4").tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "PQCodebook":
        import struct

        if len(blob) < 16 or blob[:4] != b"PBPQ":
            raise ValueError("not a PQCodebook blob")
        _, m, ksub, dsub = struct.unpack(">4sIII", blob[:16])
        want = 16 + m * ksub * dsub * 4
        if len(blob) != want:
            raise ValueError(f"PQCodebook blob truncated: {len(blob)} != {want}")
        cent = np.frombuffer(blob[16:], dtype=">f4").astype(np.float32)
        return cls(cent.reshape(m, ksub, dsub))


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    ksub: int = 256,
    sample_rows: int = 50_000,
    iters: int = 10,
    seed: int = 7,
) -> PQCodebook:
    """Train a PQ codebook on a BOUNDED deterministic sample (the
    ``sample_rows`` smallest ids — TakeOrderedAndProject, no global
    sort): per-subspace L2 k-means on the driver, the standard
    recipe (Jégou et al. 2011).  The corpus itself never collects;
    only the sample does, and codebook quality needs only a sample."""
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(sample_rows).collect()
    if not rows:
        raise ValueError("pq_train: input DataFrame is empty — a codebook "
                         "needs a training sample")
    mat = _normalize(np.array([list(r[1]) for r in rows], dtype=np.float64))
    n, dim = mat.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    k = min(ksub, n)
    rng = np.random.default_rng(seed)
    cents = np.empty((m, k, dsub), dtype=np.float32)
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        cent = sub[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(iters):
            # L2 assignment: argmax(2 x·c - |c|²) == argmin |x-c|²
            d = 2.0 * (sub @ cent.T) - (cent * cent).sum(axis=1)[None, :]
            assign = np.argmax(d, axis=1)
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        cents[j] = cent
    return PQCodebook(cents)


def _pq_assign_codes(mat: np.ndarray, cb: np.ndarray,
                     norms: np.ndarray) -> np.ndarray:
    """codes[i, j] = nearest centroid of row i's j-th subvector —
    argmax(2 x·c - |c|²) == argmin |x-c|², one matmul per subspace.
    THE single definition of the PQ encode distance: pq_encode and
    write_ivfpq_index must produce identical codes or the materialized
    index silently diverges from ad-hoc encoding."""
    m, _, dsub = cb.shape
    codes = np.empty((len(mat), m), dtype=np.uint8)
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        codes[:, j] = np.argmax(
            2.0 * (sub @ cb[j].T) - norms[j][None, :], axis=1
        ).astype(np.uint8)
    return codes


def _rerank_shortlist(spark, partials, k, shortlist_factor, rerank_with,
                      queries, vec_col, id_col, exclude_self):
    """Shared ADC-rerank tail: exact cosine over the broadcast-semi-join
    restricted shortlist (k * shortlist_factor candidates per query)."""
    shortlist = _rank_topk(partials, k * shortlist_factor)
    cand_ids = shortlist.select(F.col("neighbor_id").alias(id_col)).distinct()
    cand = rerank_with.join(F.broadcast(cand_ids), id_col, "left_semi")
    return cosine_topk(spark, cand, queries, k=k, vec_col=vec_col,
                       id_col=id_col, exclude_self=exclude_self)


def pq_encode(
    df: DataFrame,
    codebook: PQCodebook,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Map-only encode: (id long, codes binary) with one uint8 code per
    subspace — the compressed ANN representation.  Vectorized per Arrow
    batch: one matmul per subspace, codes packed row-wise."""
    cb = codebook.centroids  # captured by value in the closure
    m, _, dsub = cb.shape
    norms = (cb * cb).sum(axis=2)  # (m, ksub)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            codes = _pq_assign_codes(_normalize(_to_matrix(pdf[vec_col])), cb, norms)
            yield pd.DataFrame({
                "id": pdf[id_col].astype(np.int64),
                "codes": [c.tobytes() for c in codes],
            })

    return df.select(id_col, vec_col).mapInPandas(fn, "id long, codes binary")


def pq_topk(
    spark: SparkSession,
    codes_df: DataFrame,
    codebook: PQCodebook,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    exclude_self: bool = True,
    rerank_with: DataFrame | None = None,
    shortlist_factor: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query, an
    (m x ksub) inner-product table against the codebook (driver-built,
    tiny, broadcast); each task scores its partition with pure table
    gathers — no float vectors are read at query time, ONE map-only
    job for all queries (same shape as _fused_ann_topk), then the
    standard (partitions x queries x k)-row rank reduce.

    ``rerank_with``: the production recipe — ADC alone is a lossy
    ranking (quantization error), so pass the float-vector table to
    re-rank an ADC SHORTLIST of ``k * shortlist_factor`` candidates
    per query exactly.  The re-rank is a second small distributed job
    (cosine_topk restricted to the shortlist rows — O(queries * k *
    factor) vectors scanned via a broadcast semi join), so recall
    approaches exact while the full corpus is still only ever scored
    through its codes."""
    cb = codebook.centroids
    m, ksub, dsub = cb.shape
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = _normalize(np.array([q[1] for q in queries], dtype=np.float64))
    if qmat.shape[1] != m * dsub:
        raise ValueError(f"query dim {qmat.shape[1]} != codebook dim {m * dsub}")
    # tables[q, j, c] = <q_subj, centroid_{j,c}> — sim(q, x) ≈ Σ_j table[q, j, codes[x, j]]
    tables = np.einsum("qjd,jcd->qjc", qmat.reshape(len(qids), m, dsub),
                       cb.astype(np.float64)).astype(np.float32)
    bt = spark.sparkContext.broadcast((qids, tables))
    # partitions must emit the full shortlist depth when re-ranking
    # (plain int: a DataFrame reference inside the worker closure would
    # pickle the SparkContext)
    local_k = k * shortlist_factor if rerank_with is not None else k

    def partial(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, tables_ = bt.value
        jidx = np.arange(m)
        for pdf in it:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            codes = np.frombuffer(b"".join(pdf["codes"]), dtype=np.uint8)
            codes = codes.reshape(len(pdf), m)
            out = []
            for qi in range(len(qids_)):
                sims = tables_[qi][jidx[None, :], codes].sum(axis=1)
                if exclude_self:
                    sims[ids == qids_[qi]] = -np.inf
                kk = min(local_k, len(ids))
                part = np.argpartition(-sims, kk - 1)[:kk]
                out.append(pd.DataFrame({
                    "query_id": np.full(kk, qids_[qi]),
                    "neighbor_id": ids[part],
                    "sim": sims[part].astype(np.float64),
                }))
            yield pd.concat(out, ignore_index=True)

    partials = codes_df.select("id", "codes").mapInPandas(
        partial, "query_id long, neighbor_id long, sim double")
    if rerank_with is None:
        return _rank_topk(partials, k)
    return _rerank_shortlist(spark, partials, k, shortlist_factor,
                             rerank_with, queries, vec_col, id_col, exclude_self)


# ---- IVF-PQ: the 10^12-vector index --------------------------------------------


def write_ivfpq_index(
    df: DataFrame,
    centroids: np.ndarray,
    codebook: PQCodebook,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """Materialize the combined IVF-PQ index: (id, codes) parquet
    PARTITIONED BY list_id — the standard shape for ANN at 10^12
    vectors (FAISS IVFPQ, re-expressed as a partitioned table):

    - IVF coarse quantizer → probe reads only nprobe/n_lists of the
      corpus via partition pruning;
    - PQ codes instead of float vectors → what IS read is 16-32x
      smaller, so the pruned scan is code-gathers, not vector I/O.

    One mapInPandas pass assigns + encodes (no joins); float vectors
    appear nowhere in the index — keep the source table for the
    optional exact re-rank."""
    cent = centroids.copy()
    cb = codebook.centroids
    m, _, dsub = cb.shape
    norms = (cb * cb).sum(axis=2)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            mat = _normalize(_to_matrix(pdf[vec_col]))
            yield pd.DataFrame({
                "id": pdf[id_col].astype(np.int64),
                "codes": [c.tobytes() for c in _pq_assign_codes(mat, cb, norms)],
                "list_id": np.argmax(mat @ cent.T, axis=1).astype(np.int64),
            })

    encoded = df.select(id_col, vec_col).mapInPandas(
        fn, "id long, codes binary, list_id long")
    encoded.write.mode(mode).partitionBy("list_id").parquet(path)


def ivfpq_topk(
    spark: SparkSession,
    index_path: str,
    centroids: np.ndarray,
    codebook: PQCodebook,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    exclude_self: bool = True,
    rerank_with: DataFrame | None = None,
    shortlist_factor: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the materialized IVF-PQ index: read ONLY the union of the
    queries' nprobe partitions (pruned scan over codes), score with ADC
    table gathers, optionally re-rank the shortlist exactly.  Probe
    cost ≈ (nprobe / n_lists) x (corpus_bytes / compression) — the
    only ANN shape here whose per-query cost shrinks on BOTH axes."""
    qids_l = [int(q[0]) for q in queries]
    qmat = _normalize(np.array([q[1] for q in queries], dtype=np.float64))
    qlists = np.argsort(-(qmat @ centroids.T), axis=1)[:, :nprobe]
    probed = sorted({int(x) for row in qlists for x in row})
    pruned = spark.read.parquet(index_path).filter(F.col("list_id").isin(probed))
    # per-query probe masks: a task only scores queries probing its list
    cb = codebook.centroids
    m, ksub, dsub = cb.shape
    if qmat.shape[1] != m * dsub:
        raise ValueError(f"query dim {qmat.shape[1]} != codebook dim {m * dsub}")
    tables = np.einsum("qjd,jcd->qjc", qmat.reshape(len(qids_l), m, dsub),
                       cb.astype(np.float64)).astype(np.float32)
    qids = np.array(qids_l, dtype=np.int64)
    qsets = [set(int(x) for x in row) for row in qlists]
    bt = spark.sparkContext.broadcast((qids, tables, qsets))
    # plain int for the closure: referencing rerank_with (a DataFrame)
    # inside the worker function would try to pickle the SparkContext
    local_k = k * shortlist_factor if rerank_with is not None else k

    def partial(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, tables_, qsets_ = bt.value
        jidx = np.arange(m)
        for pdf in it:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            codes = np.frombuffer(b"".join(pdf["codes"]), dtype=np.uint8)
            codes = codes.reshape(len(pdf), m)
            lists_here = set(int(x) for x in pdf["list_id"].unique())
            out = []
            for qi in range(len(qids_)):
                if not (qsets_[qi] & lists_here):
                    continue
                mask = pdf["list_id"].isin(qsets_[qi]).to_numpy()
                if not mask.any():
                    continue
                sims = tables_[qi][jidx[None, :], codes[mask]].sum(axis=1)
                sel_ids = ids[mask]
                if exclude_self:
                    sims[sel_ids == qids_[qi]] = -np.inf
                kk = min(local_k, len(sel_ids))
                part = np.argpartition(-sims, kk - 1)[:kk]
                out.append(pd.DataFrame({
                    "query_id": np.full(kk, qids_[qi]),
                    "neighbor_id": sel_ids[part],
                    "sim": sims[part].astype(np.float64),
                }))
            if out:
                yield pd.concat(out, ignore_index=True)

    partials = pruned.select("id", "codes", "list_id").mapInPandas(
        partial, "query_id long, neighbor_id long, sim double")
    if rerank_with is None:
        return _rank_topk(partials, k)
    return _rerank_shortlist(spark, partials, k, shortlist_factor,
                             rerank_with, queries, vec_col, id_col, exclude_self)
