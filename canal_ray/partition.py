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


def partition_ids(repo: np.ndarray, path: np.ndarray, num_partitions: int) -> np.ndarray:
    """Vectorized partition id for composite key (repo, path)."""
    joined = np.char.add(
        np.char.add(repo.astype(str), "\x00"), path.astype(str)
    ).astype(object)
    h = pd.util.hash_array(joined, categorize=False)
    return (h % np.uint64(num_partitions)).astype(np.int32)
