"""Bloom filter core: numpy bitset, Kirsch-Mitzenmacher double hashing.

Behavioral parity with the reference's filter (reference
src/main/java/com/facebook/presto/bloomfilter/BloomFilter.java):

- sizing ``m = ceil(-n * ln p / (ln 2)^2)``, ``k = round(m/n * ln 2)``
  (BloomFilter.java:67,400-407) — reproduces the pinned size goldens
  (TestBloomFilter.java:80-94: 11,981,323 / 120 / 180 bytes);
- defaults n=10,000,000, p=0.01 (BloomFilter.java:64-65);
- element domain is bytes/strings; null and zero-length elements are
  silently ignored (BloomFilter.java:161-167);
- merge = bitset OR, defined only for identical geometry
  (BloomFilter.java:175-182); commutative, associative, idempotent;
- no false negatives; FPR <= p at <= n insertions.

Deliberate departures (documented, SURVEY.md §4): no two-stage
pre-filter (a CPU trick for per-row Java; our vectorized probe is
already cheap — ``operators.probe.ProbeMetrics`` keeps the reference's
``preMiss``-style probe/miss counters instead), and a clean versioned
serialization instead of gzip+Java object streams.

All update/probe paths are vectorized numpy over whole Arrow/pandas
batches — no per-row Python.
"""

from __future__ import annotations

import base64
import hashlib
import math

import numpy as np

from presto_bloomfilter_spark.functions import serialization as ser
from presto_bloomfilter_spark.functions.hashing import (
    hash_ints64,
    hash_strings64,
    km_indexes,
)

_U64 = np.uint64
_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint32)

# Hot paths work in fixed-size chunks and reuse per-process scratch
# buffers: long-lived Spark python workers then touch no new pages after
# the first batch (first-touch page faults are the dominant cost on
# memory-ballooned hosts, and fixed sizes let the allocator recycle).
_CHUNK = 1 << 18
_DENSE_SCRATCH: dict[int, np.ndarray] = {}


def _dense_buffer(n_bits: int) -> np.ndarray:
    buf = _DENSE_SCRATCH.get(n_bits)
    if buf is None:
        buf = np.zeros(n_bits, dtype=bool)
        _DENSE_SCRATCH[n_bits] = buf
    else:
        buf[:] = False
    return buf


@ser.register_kind(ser.KIND_BLOOM)
class BloomFilter:
    DEFAULT_EXPECTED_INSERTIONS = 10_000_000
    DEFAULT_FPP = 0.01

    def __init__(
        self,
        expected_insertions: int = DEFAULT_EXPECTED_INSERTIONS,
        fpp: float = DEFAULT_FPP,
        _words: np.ndarray | None = None,
    ):
        if expected_insertions <= 0:
            raise ValueError("expected_insertions must be positive")
        if not (0.0 < fpp < 1.0):
            raise ValueError("fpp must be in (0, 1)")
        self.expected_insertions = int(expected_insertions)
        self.fpp = float(fpp)
        # reference sizing formula, BloomFilter.java:67,400-407
        self.m_bits = int(
            math.ceil(-expected_insertions * math.log(fpp) / (math.log(2) ** 2))
        )
        self.k = max(1, round(self.m_bits / expected_insertions * math.log(2)))
        n_words = (self.m_bits + 63) // 64
        if _words is not None:
            if len(_words) != n_words:
                raise ValueError("payload does not match geometry")
            self.words = _words
        else:
            self.words = np.zeros(n_words, dtype=np.uint64)
        self.approx_items = 0  # rows offered (post null/empty filtering)

    # ---- geometry / metrics -------------------------------------------------

    @property
    def size_bytes(self) -> int:
        """Bitset memory, matching the reference's estimatedInMemorySize
        goldens (TestBloomFilter.java:85: 11,981,323 @ defaults)."""
        return (self.m_bits + 7) // 8

    @property
    def bits_set(self) -> int:
        # numpy<2 has no bitwise_count; popcount via uint8 view + table
        return int(_POPCOUNT8[self.words.view(np.uint8)].sum())

    @property
    def fill_ratio(self) -> float:
        return self.bits_set / self.m_bits

    def estimated_fpr(self) -> float:
        """Current FPR estimate from the fill ratio: (bits_set/m)^k."""
        return float(self.fill_ratio**self.k)

    def estimate(self) -> float:
        """Approximate distinct insertions from fill ratio
        (-m/k * ln(1 - X/m)); gives all sketches a common estimate()."""
        x = self.fill_ratio
        if x >= 1.0:
            return float("inf")
        return -self.m_bits / self.k * math.log(1.0 - x)

    # ---- updates ------------------------------------------------------------

    def _set_bits(self, h: np.ndarray) -> None:
        """Set k bits per element.

        Large batches take the dense path: scatter into a bool bitmap and
        OR the packed words in — ~25x faster than the unbuffered
        ``np.bitwise_or.at`` (measured 0.36s vs 8.7s for 1.5M tokens at
        default geometry), because fancy boolean assignment is buffered
        and ``packbits`` is a single C pass. Small batches keep the
        sparse path to avoid allocating/zeroing the m-bit bitmap.
        """
        n = len(h)
        if n == 0:
            return
        if n * self.k >= 1 << 17:
            from presto_bloomfilter_spark.functions.hashing import double_hash

            n_bits = len(self.words) * 64
            dense = _dense_buffer(n_bits)
            h1, h2 = double_hash(h)
            acc = h1.copy()
            mm = _U64(self.m_bits)
            with np.errstate(over="ignore"):
                for i in range(self.k):
                    if i:
                        acc += h2
                    # fixed-size chunks keep temp allocations recyclable
                    for s in range(0, n, _CHUNK):
                        dense[(acc[s:s + _CHUNK] % mm).astype(np.int64)] = True
            self.words |= np.packbits(dense, bitorder="little").view(_U64)
        else:
            idx = km_indexes(h, self.k, self.m_bits).ravel()
            np.bitwise_or.at(self.words, (idx >> _U64(6)).astype(np.int64), _U64(1) << (idx & _U64(63)))
        self.approx_items += n

    def add_strings(self, values) -> "BloomFilter":
        """Insert a batch of strings; None and '' are ignored
        (reference BloomFilter.java:161-167)."""
        import pandas as pd

        s = values if isinstance(values, pd.Series) else pd.Series(values, dtype=object)
        mask = s.notna() & (s.str.len() > 0)
        s = s[mask]
        if len(s):
            self._set_bits(hash_strings64(s))
        return self

    def add_ints(self, values) -> "BloomFilter":
        """Insert a batch of integers (e.g. token ids), fully vectorized."""
        a = np.asarray(values)
        if a.size:
            self._set_bits(hash_ints64(a))
        return self

    def add(self, value) -> "BloomFilter":
        """Single-element convenience (tests / interactive use)."""
        if value is None:
            return self
        if isinstance(value, (int, np.integer)):
            return self.add_ints([value])
        return self.add_strings([value])

    # ---- probes -------------------------------------------------------------

    def _probe(self, h: np.ndarray) -> np.ndarray:
        out = np.empty(len(h), dtype=bool)
        # fixed-size chunks: bounded, recyclable temporaries per batch
        for s in range(0, len(h), _CHUNK):
            idx = km_indexes(h[s:s + _CHUNK], self.k, self.m_bits)
            w = self.words[(idx >> _U64(6)).astype(np.int64)]
            hit = (w >> (idx & _U64(63))) & _U64(1)
            out[s:s + _CHUNK] = hit.all(axis=0)
        return out

    def might_contain_strings(self, values) -> np.ndarray:
        """Vectorized membership probe; None/'' → False (reference
        BloomFilterContainsScalarFunction.java:33-42 returns false for
        null elements)."""
        import pandas as pd

        s = values if isinstance(values, pd.Series) else pd.Series(values, dtype=object)
        out = np.zeros(len(s), dtype=bool)
        mask = (s.notna() & (s.str.len() > 0)).to_numpy()
        if mask.any():
            out[mask] = self._probe(hash_strings64(s[mask]))
        return out

    def might_contain_ints(self, values) -> np.ndarray:
        a = np.asarray(values)
        if a.size == 0:
            return np.zeros(0, dtype=bool)
        return self._probe(hash_ints64(a))

    def might_contain(self, value) -> bool:
        if value is None:
            return False
        if isinstance(value, (int, np.integer)):
            return bool(self.might_contain_ints([value])[0])
        return bool(self.might_contain_strings([value])[0])

    # ---- merge --------------------------------------------------------------

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        """In-place bitset union (reference putAll, BloomFilter.java:175-182).

        Unlike the reference (which would silently union mismatched
        bitsets via library internals), geometry mismatch raises.
        """
        if not isinstance(other, BloomFilter):
            raise TypeError("can only merge BloomFilter with BloomFilter")
        if (self.m_bits, self.k) != (other.m_bits, other.k):
            raise ValueError(
                f"geometry mismatch: ({self.m_bits},{self.k}) vs "
                f"({other.m_bits},{other.k}) — build with identical (n, p)"
            )
        np.bitwise_or(self.words, other.words, out=self.words)
        self.approx_items += other.approx_items
        return self

    def copy(self) -> "BloomFilter":
        c = BloomFilter(self.expected_insertions, self.fpp, _words=self.words.copy())
        c.approx_items = self.approx_items
        return c

    # ---- serialization ------------------------------------------------------

    def to_bytes(self) -> bytes:
        return ser.encode(
            ser.KIND_BLOOM,
            {
                "n": self.expected_insertions,
                "p": self.fpp,
                "items": self.approx_items,
            },
            self.words.tobytes(),
        )

    @classmethod
    def _from_parts(cls, params: dict, payload: bytes) -> "BloomFilter":
        bf = cls(params["n"], params["p"], _words=np.frombuffer(payload, np.uint64).copy())
        bf.approx_items = int(params.get("items", 0))
        return bf

    @classmethod
    def from_bytes(cls, buf: bytes) -> "BloomFilter":
        kind, params, payload = ser.decode(buf)
        if kind != ser.KIND_BLOOM:
            raise ValueError("not a bloom filter blob")
        return cls._from_parts(params, payload)

    def to_base64(self) -> str:
        """String form = base64 of the serialized bytes (reference
        to_string, BloomFilter.java:154-157)."""
        return base64.b64encode(self.to_bytes()).decode("ascii")

    @classmethod
    def from_base64(cls, s: str) -> "BloomFilter":
        return cls.from_bytes(base64.b64decode(s))

    @property
    def sha256(self) -> bytes:
        """Content hash of the bitset (cache key; reference keys its
        scalar-side LRU on a leading sha256, BloomFilter.java:409-415)."""
        return hashlib.sha256(self.words.tobytes()).digest()

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, BloomFilter)
            and self.m_bits == other.m_bits
            and self.k == other.k
            and bool(np.array_equal(self.words, other.words))
        )

    def __repr__(self) -> str:
        return (
            f"BloomFilter(n={self.expected_insertions}, p={self.fpp}, "
            f"m={self.m_bits}, k={self.k}, fill={self.fill_ratio:.4f})"
        )
