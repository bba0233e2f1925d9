"""Sketch store: persistence + resumable checkpoints.

Replaces the reference's out-of-process HTTP persistence service
(reference persist-service/server.go:30-57 — PUT/GET of base64 blobs
into boltdb/Cassandra, driven by the bloom_filter_persist /
bloom_filter_load SQL functions).  Spark-native equivalent: a directory
on a shared filesystem / object store; one file per key, atomic
write-rename publish, plus a JSON manifest per job recording
(key, sha256, params, source snapshot, per-partition lineage) — the
manifest doubles as the resumable checkpoint the north_rule requires:
a restarted job skips partitions whose partial sketches are already
persisted and merges the remainder.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from presto_bloomfilter_spark.functions import serialization as ser


def _safe_key(key: str) -> str:
    if not key or "/" in key or key.startswith("."):
        raise ValueError(f"invalid sketch key {key!r}")
    return key


class SketchStore:
    """Filesystem KV store: key → sketch bytes (PUT/GET parity with
    reference server.go:30-57)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.root, _safe_key(key) + ".sketch")

    def put(self, key: str, sketch) -> bool:
        """Persist a sketch (object or raw bytes); atomic overwrite —
        bloom_filter_persist parity (BloomFilterPersistScalarFunction
        .java:38-63: errors surface to the caller for retry)."""
        blob = sketch.to_bytes() if hasattr(sketch, "to_bytes") else bytes(sketch)
        ser.read_kind(blob)  # validate before write
        tmp = self._path(key) + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, self._path(key))
        return True

    def get_bytes(self, key: str) -> bytes:
        with open(self._path(key), "rb") as f:
            return f.read()

    def get(self, key: str):
        """Load + deserialize — bloom_filter_load parity
        (BloomFilterLoad.java:23-40)."""
        return ser.sketch_from_bytes(self.get_bytes(key))

    def exists(self, key: str) -> bool:
        return os.path.exists(self._path(key))

    def delete(self, key: str) -> bool:
        """Remove a persisted sketch; True if it existed."""
        try:
            os.remove(self._path(key))
            return True
        except FileNotFoundError:
            return False

    def put_meta(self, key: str, blob: bytes) -> bool:
        """Persist raw metadata bytes (e.g. a sharded-family manifest)
        next to the sketches — no PBFS validation, atomic overwrite."""
        path = os.path.join(self.root, _safe_key(key) + ".json")
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(bytes(blob))
        os.replace(tmp, path)
        return True

    def get_meta(self, key: str) -> bytes:
        with open(os.path.join(self.root, _safe_key(key) + ".json"), "rb") as f:
            return f.read()

    def meta_exists(self, key: str) -> bool:
        return os.path.exists(os.path.join(self.root, _safe_key(key) + ".json"))

    def keys(self) -> list[str]:
        return sorted(
            f[: -len(".sketch")] for f in os.listdir(self.root) if f.endswith(".sketch")
        )

    def load_merged(self, keys: list[str]):
        """Union of several persisted sketches — the reference's
        bloom_filter_load-as-aggregation shape (it GETs and unions per
        input row)."""
        if not keys:
            raise ValueError("no keys")
        out = self.get(keys[0])
        for k in keys[1:]:
            out.merge(self.get(k))
        return out


@dataclass
class Manifest:
    """Checkpoint manifest for a resumable sketch-build job."""

    job_id: str
    params: dict = field(default_factory=dict)
    source_snapshot: str = ""  # Iceberg snapshot id / parquet fingerprint
    partitions: dict = field(default_factory=dict)  # pid -> {key, sha256, rows}
    created_at: float = 0.0

    def to_json(self) -> str:
        return json.dumps(
            {
                "job_id": self.job_id,
                "params": self.params,
                "source_snapshot": self.source_snapshot,
                "partitions": self.partitions,
                "created_at": self.created_at,
            },
            sort_keys=True,
            indent=1,
        )

    @classmethod
    def from_json(cls, s: str) -> "Manifest":
        d = json.loads(s)
        return cls(
            job_id=d["job_id"],
            params=d.get("params", {}),
            source_snapshot=d.get("source_snapshot", ""),
            partitions={str(k): v for k, v in d.get("partitions", {}).items()},
            created_at=d.get("created_at", 0.0),
        )


class CheckpointedBuild:
    """Resumable partition-wise sketch build.

    Partial sketches are persisted per input partition under
    ``{job_id}.part{pid}``; the manifest records lineage.  ``resume``
    returns the set of partition ids already built, so a restarted job
    processes only the remainder — per-partition lineage + metrics per
    the north_rule.
    """

    def __init__(self, store: SketchStore, job_id: str, params: dict | None = None,
                 source_snapshot: str = ""):
        self.store = store
        self.job_id = job_id
        self.manifest_path = os.path.join(store.root, f"{job_id}.manifest.json")
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = Manifest.from_json(f.read())
            if source_snapshot and self.manifest.source_snapshot != source_snapshot:
                raise ValueError(
                    "checkpoint belongs to a different source snapshot: "
                    f"{self.manifest.source_snapshot!r} != {source_snapshot!r}"
                )
        else:
            self.manifest = Manifest(
                job_id=job_id, params=params or {}, source_snapshot=source_snapshot,
                created_at=time.time(),
            )

    def done_partitions(self) -> set[int]:
        return {int(p) for p in self.manifest.partitions}

    def partition_key(self, pid: int) -> str:
        return f"{self.job_id}.part{pid}"

    def record_partition(self, pid: int, sketch, rows: int) -> None:
        # serialize exactly once: the same blob is what gets persisted
        # AND what the manifest hash describes (re-encoding a
        # deserialized object would cost a second multi-MB encode per
        # partition and could in principle diverge from the stored file)
        blob = sketch.to_bytes() if hasattr(sketch, "to_bytes") else bytes(sketch)
        key = self.partition_key(pid)
        self.store.put(key, blob)
        blob_hash = ser.read_hash(blob).hex()
        self.manifest.partitions[str(pid)] = {"key": key, "sha256": blob_hash, "rows": rows}
        self._flush()

    def _flush(self) -> None:
        tmp = self.manifest_path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(self.manifest.to_json())
        os.replace(tmp, self.manifest_path)

    def merged(self):
        """Merge all persisted partials into the final sketch."""
        keys = [v["key"] for v in self.manifest.partitions.values()]
        return self.store.load_merged(sorted(keys))


def checkpointed_aggregate(spark, df, spec, store: SketchStore, job_id: str,
                           source_snapshot: str = ""):
    """Build a sketch over df with per-partition checkpointing: each
    partition's partial sketch persists before the final merge; on
    restart only missing partitions are recomputed.

    Partition partials are computed with mapInArrow (same partial-build
    path as aggregate_sketch) but keyed by partition id so lineage is
    explicit.  Returns (sketch, n_partitions_computed).
    """
    from collections.abc import Iterator

    import pyarrow as pa
    from pyspark import TaskContext

    ckpt = CheckpointedBuild(store, job_id, source_snapshot=source_snapshot)
    done = ckpt.done_partitions()

    def partial(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pid = TaskContext.get().partitionId()
        sk = spec.factory()
        rows = 0
        if pid not in done:
            for b in batches:
                rows += b.num_rows
                if b.num_rows:
                    spec.update(sk, b)
            yield pa.RecordBatch.from_arrays(
                [pa.array([pid], pa.int32()), pa.array([sk.to_bytes()], pa.binary()),
                 pa.array([rows], pa.int64())],
                ["pid", "sketch", "rows"],
            )

    pruned = df.select(*spec.columns)
    new_parts = pruned.mapInArrow(partial, "pid int, sketch binary, rows long").collect()
    for r in new_parts:
        # pass the executor's PBFS bytes straight through — decoding
        # only to re-encode wasted two full serialization passes per
        # partition blob
        ckpt.record_partition(r.pid, bytes(r.sketch), r.rows)
    return ckpt.merged(), len(new_parts)


# ---- table sink (reference's Cassandra backend analogue) ---------------------


def write_sketch_table(df, path: str, mode: str = "overwrite") -> None:
    """Persist a grouped-sketch DataFrame[key, sketch] as a parquet
    table with content hash and readable params — the table-backend
    sibling of SketchStore (reference cassandra_backend.go:22-31 is the
    same idea: sketches as rows in a queryable store instead of files).
    The extra columns make the table self-describing: sha256 for dedup/
    cache keys, params for geometry checks before any merge.  Non-sketch
    columns keep their input types (an int key round-trips as int)."""
    out_schema = ", ".join(
        [*(f"{f.name} {f.dataType.simpleString()}" if f.name != "sketch"
           else "sketch binary" for f in df.schema.fields),
         "sha256 string", "params string"]
    )

    def annotate(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["sha256"] = [ser.read_hash(b).hex() for b in pdf["sketch"]]
            pdf["params"] = [
                json.dumps(ser.read_params(b), sort_keys=True) for b in pdf["sketch"]
            ]
            yield pdf

    df.mapInPandas(annotate, out_schema).write.mode(mode).parquet(path)


def read_sketch_table(spark, path: str):
    """Load a sketch table written by write_sketch_table."""
    return spark.read.parquet(path)


def load_sketch_table_merged(spark, path: str, key_col: str | None = None):
    """Merge a sketch table back into python objects: one merged sketch
    per key (dict) when key_col is given, else one global merge of every
    row — the bloom_filter_load-over-a-table pattern."""
    rows = spark.read.parquet(path).collect()
    if not rows:
        raise ValueError(f"no sketches in table {path}")
    if key_col is None:
        out = None
        for r in rows:
            sk = ser.sketch_from_bytes(r.sketch)
            out = sk if out is None else out.merge(sk)
        return out
    merged: dict = {}
    for r in rows:
        sk = ser.sketch_from_bytes(r.sketch)
        k = r[key_col]
        merged[k] = sk if k not in merged else merged[k].merge(sk)
    return merged
