"""Primary-key hash partitioning — the MQMessageUtils analog.

Reference: per-row PK-hash partitioning with ``abs(hash) % partitionsNum`` and
DDL routed specially (``/root/reference/connector/core/src/main/java/com/
alibaba/otter/canal/connector/core/producer/MQMessageUtils.java:252-347``), and
the adapter-side per-key serial apply contract (same key -> same executor,
``client-adapter/rdb/.../RdbSyncService.java:485-510``).

Differences by design:
  - Canal hashes the *values* of configured PK columns; our PK is fixed
    ``(repo, path)`` (BASELINE.json input_hint).
  - Canal sends DDL to partition 0 only (one consumer reads the stream); our
    P sink partitions each own table shards, so DDL is **replicated to all
    partitions** (see ``canal_ray.decode``).
  - Hot-repo skew: hashing the full composite key already spreads a hot
    repo's files across partitions (the deterministic-salt scheme of
    SURVEY.md §7.4 — the salt is ``path``); per-partition hot-key counters in
    the lineage make residual skew observable.

The hash must be deterministic across processes and Python versions:
``pandas.util.hash_array`` (SipHash with a fixed key) — never builtin
``hash()`` (randomized per process).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


_GOLDEN = np.uint64(0x9E3779B97F4A7C15)  # 64-bit golden-ratio mix constant


def key_hash_words(repo: np.ndarray, path: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic 64-bit hash per key column (SipHash, fixed key).

    The pair (h1, h2) is a 128-bit key identity reused for BOTH partition
    routing and within-batch LWW grouping — one hashing pass instead of two.
    (128-bit equality as key equality: collision probability is ~n^2/2^128,
    vanishing at any feasible batch size.)
    """
    h1 = pd.util.hash_array(np.asarray(repo, dtype=object), categorize=True)
    h2 = pd.util.hash_array(np.asarray(path, dtype=object), categorize=False)
    return h1, h2


def ids_from_words(h1: np.ndarray, h2: np.ndarray, num_partitions: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = (h1 * _GOLDEN) ^ h2
    return (h % np.uint64(num_partitions)).astype(np.int32)


def partition_ids(repo: np.ndarray, path: np.ndarray, num_partitions: int) -> np.ndarray:
    """Vectorized partition id for composite key (repo, path).

    Hashes each key column independently (no per-row string concatenation —
    ``np.char.add`` is a hidden Python loop) and mixes the two words; both
    steps are deterministic across processes.
    """
    h1, h2 = key_hash_words(repo, path)
    return ids_from_words(h1, h2, num_partitions)
