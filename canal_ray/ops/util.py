"""Shared vectorized helpers for the ops modules."""

from __future__ import annotations

import logging
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_oracle_log = logging.getLogger("canal_ray.self_oracle")

# default row cap above which in-op self-oracles auto-skip
SELF_ORACLE_DEFAULT_MAX_ROWS = 1_000_000


def self_oracle_enabled(n_rows: int, what: str) -> bool:
    """Gate for the in-op full-corpus self-oracles.

    Several ops (bm25_topk, lm_perplexity, bpe_token_counts, the sketch
    bound checks, the cdc smokes) re-verify their distributed result against
    a sequential in-process recompute on every call. That is a fixture-scale
    verification device: at 100x the data the op would be killed by its own
    oracle, not its pipeline. Every registered op must be runnable at scale
    UNCHANGED, so the oracle auto-skips (with a logged warning naming what
    was skipped) once the verified input exceeds
    ``CANAL_SELF_ORACLE_MAX_ROWS`` (default 1e6 rows; set it negative to
    force oracles on at any size, 0 to disable them entirely).
    """
    raw = os.environ.get("CANAL_SELF_ORACLE_MAX_ROWS", "").strip()
    cap = int(raw) if raw else SELF_ORACLE_DEFAULT_MAX_ROWS
    if cap < 0 or n_rows <= cap:
        return True
    _oracle_log.warning(
        "self-oracle SKIPPED for %s: %d input rows > cap %d "
        "(CANAL_SELF_ORACLE_MAX_ROWS); distributed result returned unverified",
        what, n_rows, cap,
    )
    return False


def parquet_num_rows(path: str) -> int:
    """Row count from the parquet FOOTER only — no column data is read, so
    this is a safe O(1) probe for the self-oracle gate at any scale."""
    import pyarrow.parquet as pq

    return int(pq.ParquetFile(path).metadata.num_rows)


def keep_last(table: pa.Table, keys: list[str], order: list[str]) -> pa.Table:
    """Keep the max-``order`` row per ``keys`` (vectorized LWW combiner).

    Sorts ascending by ``order`` then keeps the last row per key — the same
    primitive the CDC sink uses for LWW compaction, reused as the per-batch
    partial reduce so the global shuffle only moves one row per key per block.
    """
    if table.num_rows == 0:
        return table
    idx = pc.sort_indices(table, sort_keys=[(c, "ascending") for c in order])
    table = table.take(idx)
    df = pd.DataFrame({k: table[k].to_numpy(zero_copy_only=False) for k in keys})
    mask = ~df.duplicated(keep="last").to_numpy()
    return table.filter(pa.array(mask))


def round_columns(df: pd.DataFrame, decimals: dict[str, int]) -> pd.DataFrame:
    """Round float aggregate columns so Ray's block-order-dependent float
    summation and DuckDB's sequential summation hash identically."""
    for c, d in decimals.items():
        if c in df.columns:
            df[c] = np.round(df[c].astype("float64"), d)
    return df


# per-WORKER-PROCESS broadcast cache: ray.get of a non-zero-copy object
# (python set/dict) DESERIALIZES it on every call — a map_batches task
# calling ray.get(ref) per batch pays that once per batch. Worker processes
# are reused across tasks, so caching by object-ref hex gives the same
# fetch-once behavior as an actor __init__ for plain-task stages. Bounded
# LRU (workers live across query invocations; each invocation ray.puts a
# fresh ref, so an unbounded cache pins every past broadcast forever).
_BCAST_CACHE: "OrderedDict" = None  # type: ignore[assignment]
_BCAST_CACHE_MAX = 4


def cached_get(ref):
    global _BCAST_CACHE
    if _BCAST_CACHE is None:
        from collections import OrderedDict

        _BCAST_CACHE = OrderedDict()
    key = ref.hex()
    got = _BCAST_CACHE.get(key)
    if got is None:
        import ray

        got = ray.get(ref)
        _BCAST_CACHE[key] = got
        while len(_BCAST_CACHE) > _BCAST_CACHE_MAX:
            _BCAST_CACHE.popitem(last=False)
    else:
        _BCAST_CACHE.move_to_end(key)
    return got
