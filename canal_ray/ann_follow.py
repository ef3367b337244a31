"""CDC-maintained ANN index — "the index follows the table".

The reference's ES adapter keeps a SECONDARY INDEX continuously updated from
the change stream instead of rebuilt (``client-adapter/escore/.../
ESSyncService.java:36-796``: main-table upserts flow into the index document
by document). This module fuses that contract with the persisted IVF index
of ``ops/ann.py``: upserts/deletes replayed by ``CdcJob`` into a lake flow
incrementally into a bucket-partitioned vector index, so similarity search
stays current with the table — the pipeline a training-data system runs
continuously (dedup/retrieval over a corpus that never stops changing).

Maintenance contract (incremental, O(changed keys) per epoch window — the
same diff shape as ``derived.DerivedTable``):

    per lake partition, for the epoch window (cursor, now]:
      touched      = keys in the window's delta files (+ per-key max lsn)
      old(touched) = live rows as of cursor -> REMOVE markers in OLD buckets
      new(touched) = live rows as of now    -> ADD entries in NEW buckets

Bucket files are one-per-window, rewritten deterministically on a resume
(same window -> same filename and bytes), and the cursor advances only after
every bucket file is durable — a SIGKILL anywhere leaves a re-runnable
state (asserted in tests/test_ann_follow.py).

Probe-time liveness is BUCKET-LOCAL (no global livemap): an add is live iff
it is its key's max-lsn add in that bucket and no remove marker in the SAME
bucket carries a strictly greater lsn. An update writes its remove into the
key's PREVIOUS bucket stamped with the new row's lsn, so a relocated vector
dies in the old bucket and survives in the new one; a delete's remove
carries the tombstone lsn. Centroids are trained once and frozen (standard
incremental-IVF behavior — postings move, the coarse quantizer does not).

Scale notes: per-window work is bounded by the window's changed keys (the
incremental-maintenance contract), never the corpus; probes read ONLY the
probed buckets' directories; per-bucket resolution+scoring runs as parallel
Ray tasks returning bounded top-k partials that the driver merges (the
ANN-family shape). Constraint shared with DerivedTable: bring the index
current BEFORE ``CdcJob.compact()`` (compaction folds away the deltas that
define "as of the cursor"); TRUNCATE is not supported by this follower.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from canal_ray.checkpoint import atomic_write_json, read_json
from canal_ray.ddl import TableSchema
from canal_ray.sink import (
    META_LSN,
    _atomic_write_parquet,
    compacted_through,
    lake_partition_dirs,
    merge_partition,
)


def parse_embeddings(strings: pd.Series) -> np.ndarray:
    """Comma-joined float strings (the Canal string-transport contract) ->
    L2-normalized (n, d) float64 matrix. Both the follower and its fresh
    oracle parse through here, so scores compare bit-exactly."""
    M = np.array([np.fromstring(s, dtype=np.float64, sep=",") for s in strings])
    n = np.linalg.norm(M, axis=1, keepdims=True)
    return M / np.maximum(n, 1e-12)


def _window_segment_name(cursor: int, now: int) -> str:
    return f"win_e{cursor + 1:05d}_{now:05d}.parquet"


def _partition_index_diff(
    part_dir: str,
    schema_json,
    pk: tuple[str, str],
    cursor: int,
    now: int,
    emb_col: str,
    C: np.ndarray,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """One partition's index delta for the window: (adds, removes).

    adds:    (bucket, vec_key, lsn, emb)  — emb the parsed float64 list
    removes: (bucket, vec_key, lsn)
    """
    schema = TableSchema.from_json(schema_json)

    if cursor < 0:
        # initial build: index the ENTIRE live state as of `now` (covers a
        # bootstrapped base, whose rows never appear in any delta window)
        new = merge_partition(part_dir, schema, pk, up_to_epoch=now).to_pandas()
        old = new.iloc[0:0]
        wmax = None
    else:
        touched: list[pd.DataFrame] = []
        for name in sorted(os.listdir(part_dir)) if os.path.isdir(part_dir) else []:
            if not (name.startswith("delta_e") and name.endswith(".parquet")):
                continue
            e = int(name[7:-8])
            if cursor < e <= now:
                t = pq.read_table(os.path.join(part_dir, name), columns=[*pk, META_LSN])
                touched.append(t.to_pandas())
        if not touched:
            return pd.DataFrame(), pd.DataFrame()
        win = pd.concat(touched, ignore_index=True)
        # per-key max lsn in the window: the remove stamp (== the new row's
        # lsn for updates, the tombstone's lsn for deletes)
        wmax = win.groupby(list(pk), as_index=False)[META_LSN].max()
        keys = wmax[list(pk)]

        def live(up_to: int) -> pd.DataFrame:
            t = merge_partition(part_dir, schema, pk, up_to_epoch=up_to)
            return t.to_pandas().merge(keys, on=list(pk), how="inner")

        new = live(now)
        old = live(cursor)

    adds = pd.DataFrame()
    if len(new):
        M = parse_embeddings(new[emb_col])
        adds = pd.DataFrame(
            {
                "vec_key": new[pk[0]].astype(str),
                "lsn": new[META_LSN].astype("int64"),
                "bucket": np.argmax(M @ C.T, axis=1).astype(np.int32),
                "emb": list(M),
            }
        )
    removes = pd.DataFrame()
    if len(old):
        rm = old.merge(wmax, on=list(pk), how="left", suffixes=("", "_w"))
        Mo = parse_embeddings(rm[emb_col])
        removes = pd.DataFrame(
            {
                "vec_key": rm[pk[0]].astype(str),
                "lsn": rm[f"{META_LSN}_w"].astype("int64"),
                "bucket": np.argmax(Mo @ C.T, axis=1).astype(np.int32),
            }
        )
    return adds, removes


def _probe_bucket(
    bucket_dir: str, qids: np.ndarray, Q: np.ndarray, probe: np.ndarray, b: int, k: int
) -> pd.DataFrame:
    """Resolve one bucket's live vectors and score the queries probing it;
    returns a bounded per-query partial top-k."""
    frames = []
    for name in sorted(os.listdir(bucket_dir)) if os.path.isdir(bucket_dir) else []:
        if name.endswith(".parquet"):
            frames.append(pq.read_table(os.path.join(bucket_dir, name)).to_pandas())
    if not frames:
        return pd.DataFrame()
    df = pd.concat(frames, ignore_index=True)
    adds = df[~df["is_remove"]].sort_values("lsn").drop_duplicates("vec_key", keep="last")
    rmax = df[df["is_remove"]].groupby("vec_key")["lsn"].max()
    live = adds[adds["lsn"] >= adds["vec_key"].map(rmax).fillna(-1)]
    if live.empty:
        return pd.DataFrame()
    M = np.stack(live["emb"].to_numpy())
    ids = live["vec_key"].astype("int64").to_numpy()
    out = []
    for qi in np.flatnonzero((probe == b).any(axis=1)):
        qid = int(qids[qi])
        mask = ids != qid
        if not mask.any():
            continue
        s = Q[qi] @ M[mask].T
        part = pd.DataFrame({"query_id": qid, "vec_id": ids[mask], "score": s})
        part = part.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        out.append(part)
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


class IvfIndexFollower:
    """One incrementally maintained IVF vector index over a CDC lake."""

    def __init__(
        self,
        lake_dir: str,
        index_dir: str,
        emb_col: str = "emb",
        n_clusters: int = 8,
        train_sample: int = 2_048,
    ):
        self.lake_dir = lake_dir
        self.index_dir = index_dir
        self.emb_col = emb_col
        self.n_clusters = n_clusters
        self.train_sample = train_sample
        self._cursor_path = os.path.join(index_dir, "cursor.json")
        self._centroids_path = os.path.join(index_dir, "centroids.npy")

    # ------------------------------------------------------------- state
    def cursor(self) -> int:
        obj = read_json(self._cursor_path)
        return int(obj["epoch"]) if obj else -1

    def centroids(self) -> np.ndarray:
        return np.load(self._centroids_path)

    def _ensure_centroids(self, job, now: int) -> np.ndarray:
        """Train once on the state as of the FIRST maintained epoch, then
        freeze (the file, not the training, is the source of truth — a
        resume after a kill between centroids and cursor reuses the file)."""
        if os.path.exists(self._centroids_path):
            return np.load(self._centroids_path)
        from canal_ray.ops.ann import _kmeans

        schema = TableSchema.from_json(job.final_schema().to_json())
        parts = []
        budget = self.train_sample
        for pdir in lake_partition_dirs(self.lake_dir):
            if budget <= 0:
                break
            t = merge_partition(pdir, schema, job.cfg.pk_columns, up_to_epoch=now)
            df = t.to_pandas()
            take = df.head(budget)
            if len(take):
                parts.append(parse_embeddings(take[self.emb_col]))
                budget -= len(take)
        X = np.concatenate(parts) if parts else np.zeros((0, 2))
        if len(X) < self.n_clusters:
            raise ValueError("not enough vectors to train the coarse quantizer")
        C = _kmeans(X, self.n_clusters)
        os.makedirs(self.index_dir, exist_ok=True)
        tmp = self._centroids_path + ".tmp"
        with open(tmp, "wb") as f:  # np.save(path) would append .npy to tmp
            np.save(f, C)
        os.replace(tmp, self._centroids_path)
        return C

    # ------------------------------------------------------------- update
    def update(self, job) -> dict:
        """Fold all epochs acked since the cursor into the index. Idempotent
        per target epoch; SIGKILL-safe (deterministic window rewrite)."""
        now = job.store.last_complete_epoch()
        cur = self.cursor()
        if now <= cur:
            return {"cursor": cur, "epochs_indexed": 0}
        # COMPACTION GUARD: the window diff needs the deltas in
        # (cursor, now]; once compaction folds them into base, the old
        # versions' buckets (remove targets) are unrecoverable — fail
        # loudly instead of silently dropping relocations/deletes. A fresh
        # follower (cursor < 0) is unaffected: the initial build reads the
        # merged state, compacted or not.
        if cur >= 0 and compacted_through(self.lake_dir) > cur:
            raise RuntimeError(
                "lake was compacted past the index cursor; the deltas "
                "defining the incremental diff are folded away — rebuild "
                "the index into a fresh index_dir"
            )
        C = self._ensure_centroids(job, now)
        schema_json = job.final_schema().to_json()
        pk = job.cfg.pk_columns
        task = ray.remote(num_cpus=1)(_partition_index_diff)
        futures = [
            task.remote(d, schema_json, pk, cur, now, self.emb_col, C)
            for d in lake_partition_dirs(self.lake_dir)
        ]
        results = ray.get(futures)
        adds = pd.concat([a for a, _ in results if len(a)], ignore_index=True) if any(
            len(a) for a, _ in results
        ) else pd.DataFrame(columns=["vec_key", "lsn", "bucket", "emb"])
        removes = pd.concat(
            [r for _, r in results if len(r)], ignore_index=True
        ) if any(len(r) for _, r in results) else pd.DataFrame(
            columns=["vec_key", "lsn", "bucket"]
        )
        seg = _window_segment_name(cur, now)
        n_entries = 0
        for b in sorted(set(adds["bucket"]) | set(removes["bucket"])):
            ba = adds[adds["bucket"] == b]
            br = removes[removes["bucket"] == b]
            dim = len(ba["emb"].iloc[0]) if len(ba) else 1
            rows = pd.concat(
                [
                    pd.DataFrame(
                        {"vec_key": ba["vec_key"], "lsn": ba["lsn"],
                         "is_remove": False, "emb": ba["emb"]}
                    ),
                    pd.DataFrame(
                        {"vec_key": br["vec_key"], "lsn": br["lsn"],
                         "is_remove": True,
                         "emb": [np.zeros(0)] * len(br)}
                    ),
                ],
                ignore_index=True,
            ).sort_values(["is_remove", "vec_key", "lsn"]).reset_index(drop=True)
            # vectorized list<float64> build: one flat values buffer + offsets
            lens = np.fromiter((len(e) for e in rows["emb"]), dtype=np.int64, count=len(rows))
            flat = (
                np.concatenate([np.asarray(e, dtype=np.float64) for e in rows["emb"]])
                if lens.sum()
                else np.zeros(0)
            )
            offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
            t = pa.table(
                {
                    "vec_key": pa.array(rows["vec_key"], type=pa.string()),
                    "lsn": pa.array(rows["lsn"].astype("int64")),
                    "is_remove": pa.array(rows["is_remove"].astype(bool)),
                    "emb": pa.ListArray.from_arrays(
                        pa.array(offsets), pa.array(flat, type=pa.float64())
                    ),
                }
            )
            bdir = os.path.join(self.index_dir, "buckets", f"bucket={int(b)}")
            os.makedirs(bdir, exist_ok=True)
            _atomic_write_parquet(t, os.path.join(bdir, seg))
            n_entries += len(rows)
        atomic_write_json(self._cursor_path, {"epoch": now})
        return {"cursor": now, "epochs_indexed": now - cur, "entries": n_entries}

    # ------------------------------------------------------------- probe
    def probe(self, qids: np.ndarray, Q: np.ndarray, k: int = 10, nprobe: int = 4) -> pd.DataFrame:
        """IVF probe against the followed index: per-bucket Ray tasks resolve
        liveness and return bounded top-k partials; the driver merges."""
        C = self.centroids()
        probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
        wanted = sorted({int(b) for row in probe for b in row})
        task = ray.remote(num_cpus=1)(_probe_bucket)
        futures = [
            task.remote(
                os.path.join(self.index_dir, "buckets", f"bucket={b}"),
                qids, Q, probe, b, k,
            )
            for b in wanted
        ]
        parts = [p for p in ray.get(futures) if len(p)]
        return _finalize_topk(parts, k)


def _finalize_topk(parts: list[pd.DataFrame], k: int) -> pd.DataFrame:
    if not parts:
        return pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "vec_id": pd.Series([], dtype="int64"),
             "rank": pd.Series([], dtype="int64"),
             "score": pd.Series([], dtype="float64")}
        )
    g = pd.concat(parts, ignore_index=True)
    g = g.sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
    g = g.groupby("query_id", as_index=False, sort=False).head(k).reset_index(drop=True)
    g["rank"] = g.groupby("query_id").cumcount() + 1
    g["score"] = np.round(g["score"], 8)
    return g[["query_id", "vec_id", "rank", "score"]].astype(
        {"query_id": "int64", "vec_id": "int64", "rank": "int64"}
    )


def fresh_reference_probe(
    state: pd.DataFrame,
    C: np.ndarray,
    qids: np.ndarray,
    Q: np.ndarray,
    emb_col: str = "emb",
    key_col: str = "vid",
    k: int = 10,
    nprobe: int = 4,
) -> pd.DataFrame:
    """Oracle: the probe results a FRESH index built from the final lake
    state (same frozen centroids) would return — sequential, in-process."""
    M = parse_embeddings(state[emb_col])
    ids = state[key_col].astype("int64").to_numpy()
    buckets = np.argmax(M @ C.T, axis=1)
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    parts = []
    for qi, qid in enumerate(qids):
        mask = np.isin(buckets, probe[qi]) & (ids != int(qid))
        if not mask.any():
            continue
        s = Q[qi] @ M[mask].T
        parts.append(
            pd.DataFrame({"query_id": int(qid), "vec_id": ids[mask], "score": s})
        )
    return _finalize_topk(parts, k)
