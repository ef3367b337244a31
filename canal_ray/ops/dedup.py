"""Deduplication ops over ``documents`` (training-data pipeline staples).

Exact (hash groupby), MinHash+LSH (shingle -> minhash -> band-bucket groupby
-> verified Jaccard), SimHash — all public algorithms (Broder 1997; Charikar
2002; Schleimer et al. winnowing), built Ray-Data-first:

  - per-batch work is vectorized numpy (``np.minimum.reduceat`` segment-mins
    for minhash, ``np.add.reduceat`` for simhash bit counts);
  - the only shuffles are the band-bucket / hash groupbys; the exact-verify
    stage is a PRUNED-READ lookup join (each pair batch reads only the row
    groups holding its documents) — no extra AllToAll, and nothing
    corpus-derived is collected to the driver.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

# fixed MinHash parameters (deterministic; shared by tests)
N_PERM = 64
N_BANDS = 16  # 16 bands x 4 rows: catches J >~ 0.5 w.h.p.
_P = np.uint64((1 << 61) - 1)
_RNG = np.random.default_rng(12345)
_A = (_RNG.integers(1, _P, size=N_PERM, dtype=np.uint64) | np.uint64(1))
_B = _RNG.integers(0, _P, size=N_PERM, dtype=np.uint64)


def _md5(texts: pd.Series) -> pd.Series:
    # md5 chosen to match the DuckDB oracle's md5(); the vectorized
    # alternative below is the 100 TB path (same groupby-dedup shape)
    return texts.map(lambda t: hashlib.md5(t.encode()).hexdigest())


def _fast_hash(texts: pd.Series) -> pd.Series:
    # vectorized 64-bit content hash (pandas' siphash over the whole column,
    # one C pass — no per-row Python): the scale default when oracle-exact
    # md5 digests are not required
    h = pd.util.hash_array(texts.to_numpy(dtype=object))
    return pd.Series(np.char.mod("%016x", h), index=texts.index)


def exact_dedup(sf_dir: str, hash_fn: str = "md5") -> pd.DataFrame:
    """Exact dedup: content hash -> keep min doc_id per hash + dup count.

    ``hash_fn="md5"`` (default) matches the DuckDB oracle byte-for-byte;
    ``hash_fn="fast"`` uses the vectorized 64-bit hash for large corpora.
    """
    hasher = _md5 if hash_fn == "md5" else _fast_hash
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": batch["doc_id"], "text_md5": hasher(batch["text"])})

    hashed = ds.map_batches(add_hash, batch_format="pandas")
    # shard-keyed groups (one Ray group per hash shard, pandas sub-groupby
    # inside) — one Ray group per distinct hash would be millions of ~1-row
    # dispatches at corpus scale
    hashed = hashed.map_batches(
        lambda df: df.assign(
            _shard=(pd.util.hash_array(df["text_md5"].to_numpy(dtype=object)) % 64).astype("int64")
        ),
        batch_format="pandas",
    )

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        agg = (
            g.groupby("text_md5", sort=False)
            .agg(doc_id=("doc_id", "first"), n_dups=("doc_id", "size"))
            .reset_index()
        )
        return agg[["doc_id", "text_md5", "n_dups"]]

    out = hashed.groupby("_shard").map_groups(per_shard, batch_format="pandas")
    df = out.to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_dups"] = df["n_dups"].astype("int64")
    return df


# multipliers for the vectorized rolling shingle hash (splitmix64 / xxhash
# odd constants — public domain mixing constants)
_C1 = np.uint64(0x9E3779B97F4A7C15)


def _roll(h: np.ndarray, k: int) -> np.ndarray:
    """Polynomial combine of k consecutive element hashes (vectorized
    Horner, wrapping uint64): the window hash of every k-window of ``h``."""
    if len(h) == 0:
        return np.zeros(1, dtype=np.uint64)
    if len(h) < k:
        acc = np.zeros(1, dtype=np.uint64)
        for j in range(len(h)):
            acc = acc * _C1 + h[j]
        return acc
    W = np.lib.stride_tricks.sliding_window_view(h, k)
    acc = np.zeros(len(W), dtype=np.uint64)
    for j in range(k):
        acc = acc * _C1 + W[:, j]
    return acc


def _shingle_hashes(text: str, k: int = 3, mode: str = "word") -> np.ndarray:
    """Hashed shingle set: k-token windows ('word') or byte k-grams
    ('char'), fully vectorized — element hashes once, then a rolling
    polynomial combine instead of per-window string joins (the joins were
    ~8ms/doc, the whole-pipeline hot spot)."""
    with np.errstate(over="ignore"):
        if mode == "char":
            b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            return np.unique(_roll(b, k))
        toks = text.split()
        if not toks:
            return np.zeros(1, dtype=np.uint64)
        hw = pd.util.hash_array(np.array(toks, dtype=object)).astype(np.uint64)
        return np.unique(_roll(hw, k))


class MinHasher:
    """Per-doc 64-perm minhash signature, vectorized via one flattened
    (all-shingles x perms) matrix + segment-min reduceat. Run as a TASK-pool
    stage (construction is two field assignments — an actor pool's startup
    blocks the pipeline for seconds and caps the stage at the pool size)."""

    def __init__(self, k: int = 3, mode: str = "word"):
        self.k = k
        self.mode = mode

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        per_doc = [_shingle_hashes(t, self.k, self.mode) for t in batch["text"].tolist()]
        lens = np.array([len(s) for s in per_doc])
        flat = np.concatenate(per_doc)
        # (n_shingles, N_PERM) permuted hashes; modular arithmetic in uint64
        H = (flat[:, None] * _A[None, :] + _B[None, :]) % _P
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        sigs = np.minimum.reduceat(H, starts, axis=0)  # (n_docs, N_PERM)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "sig": list(sigs.astype(np.uint64)),
            }
        )


def minhash_signatures(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(lambda df: MinHasher()(df), batch_format="pandas")
    df = out.to_pandas()
    # stable scalar signature digest for comparison/storage
    df["sig_hash"] = df["sig"].map(lambda s: int(pd.util.hash_array(np.asarray(s, dtype=np.uint64))[0] & ((1 << 63) - 1)))
    return df[["doc_id", "sig_hash"]]


def _band_rows(df: pd.DataFrame) -> pd.DataFrame:
    """Explode signatures to (band_id, band_hash, doc_id, sig) rows.

    The full signature rides along (one copy per band) so the bucket groupby
    can estimate Jaccard in-group without any driver collect or broadcast —
    the shuffle carries N_BANDS x 512B per doc, which is the price of fully
    distributed candidate filtering.
    """
    sigs = np.stack(df["sig"].to_numpy())  # (n, N_PERM)
    rows_per_band = N_PERM // N_BANDS
    out = []
    for b in range(N_BANDS):
        chunk = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
        bh = pd.util.hash_array(
            np.ascontiguousarray(chunk).view([("", np.uint64)] * rows_per_band).ravel()
        ).astype(np.int64)
        out.append(
            pd.DataFrame(
                {
                    "band_id": b,
                    "band_hash": bh,
                    "doc_id": df["doc_id"].to_numpy(),
                    "sig": df["sig"].to_numpy(),
                }
            )
        )
    return pd.concat(out, ignore_index=True)


# one live PairVerifier per worker process (keyed by its construction args);
# task-pool map_batches + Ray's worker reuse give actor-like amortization of
# the parquet handle / blob cache without an actor pool's concurrency cap
_VERIFIER_MEMO: dict = {}


class PairVerifier:
    """Exact-Jaccard verify over candidate pairs (stateful helper).

    Setup once per worker (via ``_VERIFIER_MEMO``): open the corpus parquet
    and index its row-group doc_id ranges. Per batch (``__call__``): read
    only the row groups holding the batch's documents, shingle them,
    intersect per pair. The bounded blob cache absorbs the hot docs that
    recur across batches (band collisions are Zipf-shaped too)."""

    _CACHE_CAP = 65_536

    def __init__(self, docs_path: str, k: int, mode: str, threshold: float):
        import pyarrow.parquet as pq

        self.pf = pq.ParquetFile(docs_path)
        md = self.pf.metadata
        leaf = [md.schema.column(j).name for j in range(md.num_columns)]
        j = leaf.index("doc_id")
        self.rg_bounds = []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(j).statistics
            self.rg_bounds.append(
                (st.min, st.max) if st is not None and st.min is not None
                else (None, None)
            )
        self.k, self.mode, self.threshold = k, mode, threshold
        self.cache: dict[int, np.ndarray] = {}

    def _blobs(self, ids: np.ndarray) -> dict[int, np.ndarray]:
        need = np.array([i for i in ids if i not in self.cache], dtype=np.int64)
        if need.size:
            rgs = [
                g
                for g, (lo, hi) in enumerate(self.rg_bounds)
                if lo is None or ((need >= lo) & (need <= hi)).any()
            ]
            t = self.pf.read_row_groups(rgs, columns=["doc_id", "text"])
            m = np.isin(t["doc_id"].to_numpy(), need)
            t = t.filter(pa.array(m))
            if len(self.cache) + t.num_rows > self._CACHE_CAP:
                self.cache.clear()
            for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
                self.cache[did] = _shingle_hashes(txt, self.k, self.mode)
        return self.cache

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(subset=["doc_a", "doc_b"])
        if df.empty:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                    "jaccard": pd.Series([], dtype="float64"),
                }
            )
        a = df["doc_a"].to_numpy()
        b = df["doc_b"].to_numpy()
        blobs = self._blobs(np.unique(np.concatenate([a, b])))
        jac = np.zeros(len(a))
        for i in range(len(a)):
            sa, sb = blobs[a[i]], blobs[b[i]]
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            jac[i] = inter / (sa.size + sb.size - inter)
        out = pd.DataFrame(
            {
                "doc_a": a.astype("int64"),
                "doc_b": b.astype("int64"),
                "jaccard": np.round(jac, 6),
            }
        )
        return out[out["jaccard"] >= self.threshold].reset_index(drop=True)


def minhash_lsh_dup_pairs(
    sf_dir: str,
    jaccard_threshold: float = 0.5,
    k: int = 3,
    mode: str = "word",
    max_bucket: int = 64,
) -> pd.DataFrame:
    """MinHash+LSH near-dup pairs with two-stage verification.

    shingle -> minhash (map_batches) -> band explode -> band-bucket groupby ->
    candidate pairs -> vectorized signature-estimated Jaccard pre-filter ->
    exact Jaccard verify on the survivors -> (doc_a, doc_b, jaccard).

    Candidate control at scale: a band bucket larger than ``max_bucket`` is
    truncated to its first ``max_bucket`` doc_ids (sorted) — an oversized
    bucket means "everything in it matches everything", so pair enumeration
    there is redundant for dedup (the survivors still chain the cluster via
    union-find in :func:`minhash_dedup_keep`). Without the cap, a corpus of
    highly-similar docs makes candidate pairs O(n^2) and verification time
    explodes (observed: driver pinned for minutes at sf0.1).
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sigs = ds.map_batches(
        lambda df: MinHasher(k, mode)(df), batch_format="pandas"
    )
    bands = sigs.map_batches(_band_rows, batch_format="pandas")

    est_floor = jaccard_threshold - 0.2
    n_shards = 64  # Ray groups = (band, shard); buckets sub-grouped in pandas
    bands = bands.map_batches(
        lambda df: df.assign(shard=(df["band_hash"].to_numpy() % n_shards)),
        batch_format="pandas",
    )

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One Ray group = many band buckets (a shard). Bucket segmentation
        is one lexsort + boundary diff; the Python loop touches ONLY buckets
        with >= 2 docs (true collisions — a tiny fraction), not every bucket
        (a pandas groupby over thousands of singleton buckets was the
        stage's hot spot)."""
        bh = g["band_hash"].to_numpy()
        did = g["doc_id"].to_numpy()
        order = np.lexsort((did, bh))
        bh, did = bh[order], did[order]
        # dedup (band_hash, doc_id) — same doc can land in a bucket twice
        keep = np.ones(len(bh), dtype=bool)
        keep[1:] = (bh[1:] != bh[:-1]) | (did[1:] != did[:-1])
        bh, did = bh[keep], did[keep]
        sig_arr = g["sig"].to_numpy()[order[keep]]
        starts = np.flatnonzero(np.concatenate([[True], bh[1:] != bh[:-1]]))
        ends = np.concatenate([starts[1:], [len(bh)]])
        multi = (ends - starts) >= 2
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(starts[multi], ends[multi]):
            e = min(e, s + max_bucket)  # oversized-bucket cap (see docstring)
            ids = did[s:e]  # already doc_id-sorted within the bucket
            S = np.stack(sig_arr[s:e])
            a, b = np.triu_indices(len(ids), k=1)
            est = (S[a] == S[b]).mean(axis=1)
            sel = est >= est_floor
            if sel.any():
                out_a.append(ids[a[sel]])
                out_b.append(ids[b[sel]])
        if not out_a:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
        )

    pairs_ds = bands.groupby(["band_id", "shard"]).map_groups(
        shard_pairs, batch_format="pandas"
    )
    # NOTE: pairs may repeat across bands; global dedup happens inside the
    # verify stage's pair-shard groupby (no standalone dedup shuffle — every
    # groupby operator costs seconds of fixed AllToAll setup)

    empty = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64"),
        }
    )

    # stage 2: exact Jaccard verify as a PRUNED-READ lookup join — the band
    # groupby above stays the pipeline's ONE AllToAll (each Ray groupby
    # costs seconds of fixed exchange setup regardless of bytes; the r2
    # repartition-join verify paid that floor three times). Candidate pairs
    # stream through an actor pool; each batch reads ONLY the parquet row
    # groups containing its documents (row-group-stat pruning, the IVF-probe
    # shape), re-shingles them, and intersects. Nothing corpus-derived is
    # collected to the driver and no corpus-scale bytes move: the docs a
    # verify task touches are exactly the candidates' — O(pairs), not O(n).
    # At 10^10 docs the same stage points at a doc-shard-bucketed shingle-
    # blob directory written once by a linear pass (the embedding block
    # layout below); the per-pair math is unchanged.
    # task-pool stage, NOT an actor pool: Ray fuses this with the band
    # groupby's output operator, and an actor pool would cap the whole fused
    # chain (bucket pair enumeration included) at the pool size — measured
    # 4x worse at 32 CPUs. Worker-process reuse amortizes the verifier's
    # parquet handle + blob cache across tasks via the module memo.
    vargs = (f"{sf_dir}/documents.parquet", k, mode, jaccard_threshold)

    def verify_batch(df: pd.DataFrame) -> pd.DataFrame:
        v = _VERIFIER_MEMO.get(vargs)
        if v is None:
            _VERIFIER_MEMO.clear()  # one live verifier per worker process
            v = _VERIFIER_MEMO[vargs] = PairVerifier(*vargs)
        return v(df)

    out = pairs_ds.map_batches(verify_batch, batch_format="pandas").to_pandas()
    if out.empty:
        return empty
    # a pair can surface from several bands (and therefore batches); verify
    # is deterministic, so duplicates are identical rows — drop here
    return (
        out.drop_duplicates(subset=["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
        .astype({"doc_a": "int64", "doc_b": "int64"})
    )


def ngram_jaccard_pairs(
    sf_dir: str, n: int = 5, jaccard_threshold: float = 0.6
) -> pd.DataFrame:
    """Character n-gram Jaccard near-dup pairs (the char-level variant):
    same LSH candidate machinery, char shingles, exact Jaccard verify."""
    return minhash_lsh_dup_pairs(sf_dir, jaccard_threshold, k=n, mode="char")


def _full_shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct hashes of the FULL k-token windows only (no partial window
    for short docs — matches the SQL oracle, where a doc with < k tokens has
    an empty shingle set and therefore can never pair)."""
    toks = text.split()
    if len(toks) < k:
        return np.array([], dtype=np.uint64)
    hw = pd.util.hash_array(np.array(toks, dtype=object)).astype(np.uint64)
    with np.errstate(over="ignore"):
        W = np.lib.stride_tricks.sliding_window_view(hw, k)
        acc = np.zeros(len(W), dtype=np.uint64)
        for j in range(k):
            acc = acc * _C1 + W[:, j]
    return np.unique(acc)


def ngram_jaccard_exact_pairs(
    sf_dir: str, k: int = 3, jaccard_threshold: float = 0.5, n_shards: int = 64,
    max_df: int = 256,
) -> pd.DataFrame:
    """EXACT all-pairs word k-gram Jaccard (SQL-oracle-checkable, unlike the
    LSH-candidate variant whose recall is probabilistic).

    Distributed as the SQL plan itself, pre-aggregated at every step:
      1. map_batches: explode each doc to (shingle_hash, doc_id, n_sh) rows —
         n_sh rides on every row so no separate sizes join is needed;
      2. groupby(shingle-shard).map_groups: inside one shard, bucket-segment
         by shingle (one lexsort), enumerate co-occurring doc pairs per
         bucket, and LOCALLY sum duplicate pairs (partial intersection
         counts) before the second shuffle;
      3. groupby(pair-shard).map_groups: sum partial counts to the true
         intersection, jaccard = c / (n_a + n_b - c), filter >= threshold.

    CONTRACT (document-frequency cap): shingles occurring in more than
    ``max_df`` documents are excluded from intersection counting — pair
    enumeration inside one bucket is O(df^2), and ONE boilerplate shingle
    shared by 10^6 docs would otherwise explode the plan (the same guard
    the LSH path applies as ``max_bucket``). Union sizes (each doc's total
    distinct-shingle count) are NOT affected, so a pair sharing a hot
    shingle scores a LOWER jaccard than the uncapped definition; the DuckDB
    oracle applies the identical HAVING count(*) <= max_df filter. Because
    a shingle's rows are sharded BY shingle hash, the bucket size seen
    inside one shard group IS the global df — the cap is exact, not
    per-partition. Bounded-pair behavior is asserted by a synthetic
    hot-shingle pytest (tests/test_ops_approx.py).
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        per_doc = [_full_shingle_hashes(t, k) for t in b["text"].tolist()]
        lens = np.array([len(s) for s in per_doc], dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame(
                {"sh": pd.Series([], dtype="uint64"),
                 "doc_id": pd.Series([], dtype="int64"),
                 "n_sh": pd.Series([], dtype="int64"),
                 "_shard": pd.Series([], dtype="int64")}
            )
        sh = np.concatenate([s for s in per_doc if len(s)])
        doc = np.repeat(b["doc_id"].to_numpy().astype(np.int64), lens)
        n_sh = np.repeat(lens, lens)
        return pd.DataFrame(
            {"sh": sh, "doc_id": doc, "n_sh": n_sh,
             "_shard": (sh % np.uint64(n_shards)).astype(np.int64)}
        )

    rows = ds.map_batches(explode, batch_format="pandas")

    def shard_partial_counts(g: pd.DataFrame) -> pd.DataFrame:
        sh = g["sh"].to_numpy()
        did = g["doc_id"].to_numpy()
        nsh = g["n_sh"].to_numpy()
        order = np.lexsort((did, sh))
        sh, did, nsh = sh[order], did[order], nsh[order]
        starts = np.flatnonzero(np.concatenate([[True], sh[1:] != sh[:-1]]))
        ends = np.concatenate([starts[1:], [len(sh)]])
        out = []
        for s, e in zip(starts, ends):
            # e - s is this shingle's GLOBAL df (rows sharded by shingle);
            # df-cap hot shingles before the O(df^2) pair enumeration
            if e - s < 2 or e - s > max_df:
                continue
            a, b = np.triu_indices(e - s, k=1)
            out.append(
                pd.DataFrame(
                    {"doc_a": did[s + a], "doc_b": did[s + b],
                     "n_a": nsh[s + a], "n_b": nsh[s + b]}
                )
            )
        if not out:
            # MUST carry _pshard too: schema unification across blocks takes
            # whichever block lands first, and the downstream groupby sort
            # validates against it — a pair-less shard with a narrower
            # schema is a race (observed: "no such column '_pshard'")
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64"),
                 "n_a": pd.Series([], dtype="int64"),
                 "n_b": pd.Series([], dtype="int64"),
                 "c": pd.Series([], dtype="int64"),
                 "_pshard": pd.Series([], dtype="int64")}
            )
        p = pd.concat(out, ignore_index=True)
        # local partial aggregation: one row per pair per shard
        agg = (
            p.groupby(["doc_a", "doc_b", "n_a", "n_b"], sort=False)
            .size().rename("c").reset_index()
        )
        agg["_pshard"] = (
            pd.util.hash_pandas_object(agg[["doc_a", "doc_b"]], index=False).to_numpy()
            % n_shards
        ).astype("int64")
        return agg

    partials = rows.groupby("_shard").map_groups(
        shard_partial_counts, batch_format="pandas"
    )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(["doc_a", "doc_b", "n_a", "n_b"], sort=False)["c"]
            .sum().reset_index()
        )
        c = agg["c"].to_numpy(dtype=np.float64)
        union = agg["n_a"].to_numpy() + agg["n_b"].to_numpy() - c
        jac = np.round(c / union, 6)
        keep = jac >= jaccard_threshold
        return pd.DataFrame(
            {"doc_a": agg["doc_a"].to_numpy()[keep].astype("int64"),
             "doc_b": agg["doc_b"].to_numpy()[keep].astype("int64"),
             "jaccard": jac[keep]}
        )

    out = partials.groupby("_pshard").map_groups(finalize, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _label_components_distributed(
    sf_dir: str,
    pairs: pd.DataFrame,
    n_partitions: int | None = None,
    max_rounds: int = 64,
) -> pd.DataFrame:
    """DataFrame contract over :func:`_label_components_distributed_ds`
    (the driver-window oracle shape; the lake path streams instead)."""
    out = _label_components_distributed_ds(
        sf_dir, pairs, n_partitions, max_rounds
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _label_components_distributed_ds(
    sf_dir: str,
    pairs: pd.DataFrame,
    n_partitions: int | None = None,
    max_rounds: int = 64,
):
    """Corpus-scale component labeling: iterative min-label propagation,
    fully distributed — the escape hatch ``_label_components`` documents,
    implemented (used automatically above ``CANAL_CC_DRIVER_MAX`` edges).

    Shape (the standard BSP connected-components loop, e.g. Kiveris et al.
    "Connected Components in MapReduce and Beyond", SoCC'14 — here the
    plain propagation variant, right for near-dup clusters whose diameter
    is small):

      1. symmetrize edges -> adjacency (node, nbr);
      2. labels(node) := min(node, min nbr)  [round 0 fused into init];
      3. round: hash-join adjacency with labels on nbr, groupby(node) min
         over {own label} ∪ {neighbour labels};
      4. converged when sum(labels) stops falling (labels only ever
         decrease, so the integer sum is a strictly monotone progress
         measure — one tiny driver scalar per round, never the labels);
      5. corpus LEFT OUTER JOIN labels: untouched docs are singletons.

    Per round: one hash join + one groupby (2 exchanges over NODE-scale
    data, never corpus-scale); rounds = component diameter. Labels are
    ``materialize()``-d each round — that is the fixpoint state of an
    iterative algorithm, bounded by the edge-touched node set, not the
    corpus."""
    if len(pairs) == 0:
        return rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        ).map_batches(_all_singletons, batch_format="pyarrow")

    if n_partitions is None:
        # scale the exchange width with the cluster (and the edge set) —
        # a fixed 16-way exchange over a 10^10-doc corpus would serialize
        # the final left-outer join; overridable for tests/tuning
        env = os.environ.get("CANAL_CC_PARTITIONS")
        if env:
            n_partitions = max(1, int(env))
        else:
            cpus = int(ray.cluster_resources().get("CPU", 8))
            n_partitions = max(8, min(2 * cpus, 1 + len(pairs) // 250_000))

    a = pairs["doc_a"].to_numpy(dtype=np.int64)
    b = pairs["doc_b"].to_numpy(dtype=np.int64)
    adj = rd.from_arrow(
        pa.table(
            {
                "node": np.concatenate([a, b]),
                "nbr": np.concatenate([b, a]),
            }
        )
    )

    def _min_of(t: pa.Table, col_node: str, col_lbl: str) -> pa.Table:
        df = pd.DataFrame(
            {"node": t[col_node].to_numpy(), "label": t[col_lbl].to_numpy()}
        )
        m = df.groupby("node", as_index=False)["label"].min()
        return pa.table(
            {
                "node": m["node"].to_numpy(dtype=np.int64),
                "label": m["label"].to_numpy(dtype=np.int64),
            }
        )

    # labels := min(node, min nbr) — per-batch combiner then ONE groupby
    labels = (
        adj.map_batches(
            lambda t: _min_of(
                pa.table(
                    {
                        "n": pa.concat_arrays(
                            [t["node"].combine_chunks(), t["node"].combine_chunks()]
                        ),
                        "l": pa.concat_arrays(
                            [t["node"].combine_chunks(), t["nbr"].combine_chunks()]
                        ),
                    }
                ),
                "n",
                "l",
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .min("label")
        .map_batches(
            lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"
        )
        # sort-based groupby emits surplus partitions as schema-less EMPTY
        # blocks (see BASELINE.md round-4 note); acero rejects them as join
        # inputs ("no match for FieldRef node"), so coalesce — one extra
        # node-scale exchange per round, the sanitization price
        .repartition(n_partitions)
        .materialize()
    )
    prev_sum = labels.sum("label")
    for _ in range(max_rounds):
        nbr_lbl = adj.join(
            labels, join_type="inner", num_partitions=n_partitions,
            on=("nbr",), right_on=("node",), right_suffix="_r",
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        labels_new = (
            labels.union(nbr_lbl)
            .groupby("node")
            .min("label")
            .map_batches(
                lambda t: t.rename_columns(["node", "label"]),
                batch_format="pyarrow",
            )
            .repartition(n_partitions)  # same empty-block sanitization
            .materialize()
        )
        new_sum = labels_new.sum("label")
        labels = labels_new
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        # the sum was still falling when rounds ran out: the labels are
        # partially propagated (components wider than max_rounds). Returning
        # them would be silent incorrectness at exactly the scale (>5M
        # edges, long dup chains) where this path engages — fail loudly.
        raise RuntimeError(
            f"connected-components propagation did not converge within "
            f"{max_rounds} rounds (label sum still decreasing); raise "
            f"max_rounds for high-diameter components"
        )

    corpus = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    joined = corpus.join(
        labels, join_type="left_outer", num_partitions=n_partitions,
        on=("doc_id",), right_on=("node",),
    )

    def finish(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy().astype(np.int64)
        lbl = t["label"].to_numpy(zero_copy_only=False)
        dup = np.where(pd.isna(lbl), d, lbl).astype(np.int64)
        return pa.table({"doc_id": d, "dup_of": dup, "is_dup": dup != d})

    return joined.map_batches(finish, batch_format="pyarrow")


def _all_singletons(t: pa.Table) -> pa.Table:
    d = t["doc_id"].to_numpy().astype(np.int64)
    return pa.table({"doc_id": d, "dup_of": d, "is_dup": np.zeros(len(d), dtype=bool)})


# above this many verified edges the driver union-find in
# _label_components gives way to the distributed propagation loop
CC_DRIVER_MAX_EDGES = 5_000_000


def _label_components(sf_dir: str, pairs: pd.DataFrame) -> pd.DataFrame:
    """Component labeling for the dedup-keep variants, 100 TB-shaped:
    union-find over the (tiny) verified edge set runs on the driver, is
    COLLAPSED to a flat sorted (doc -> root) array pair, broadcast once
    (``ray.put``), and every corpus batch resolves its labels with ONE
    vectorized ``np.searchsorted`` inside ``map_batches`` — the corpus
    itself never lands on the driver and no per-row Python runs. At 10^10
    docs only the edge map rides the object store; past
    ``CC_DRIVER_MAX_EDGES`` (env ``CANAL_CC_DRIVER_MAX``) the labeling
    switches to :func:`_label_components_distributed` — the same contract
    with zero driver-resident state (equality asserted in
    tests/test_ops_approx.py)."""
    out = _labeled_dataset(sf_dir, pairs).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _labeled_dataset(sf_dir: str, pairs: pd.DataFrame):
    """(doc_id, dup_of, is_dup) for every corpus doc as a STREAMING Dataset —
    the shared core of the DataFrame oracle contract (:func:`_label_components`)
    and the production lake write (:func:`dedup_labels_to_parquet`)."""
    import ray

    from canal_ray.ops.util import cached_get

    cap = int(os.environ.get("CANAL_CC_DRIVER_MAX", str(CC_DRIVER_MAX_EDGES)))
    if len(pairs) > cap:
        return _label_components_distributed_ds(sf_dir, pairs)

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    nodes = np.array(sorted(parent.keys()), dtype=np.int64)
    roots = np.array([find(int(x)) for x in nodes], dtype=np.int64)
    map_ref = ray.put((nodes, roots))

    def label(t: pa.Table) -> pa.Table:
        ks, vs = cached_get(map_ref)
        d = t["doc_id"].to_numpy().astype(np.int64)
        dup = d.copy()
        if len(ks):
            idx = np.clip(np.searchsorted(ks, d), 0, len(ks) - 1)
            hit = ks[idx] == d
            dup[hit] = vs[idx[hit]]
        return pa.table(
            {"doc_id": d, "dup_of": dup, "is_dup": dup != d}
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(label, batch_format="pyarrow")


def dedup_labels_to_parquet(
    sf_dir: str,
    out_dir: str,
    method: str = "jaccard",
    jaccard_threshold: float = 0.5,
    n_buckets: int = 64,
) -> str:
    """Production output path of dedup-keep labeling: the labeled corpus is
    WRITTEN as hash-bucketed partitioned parquet (one directory per
    ``doc_id % n_buckets``) instead of returned as a driver DataFrame — at
    10^10 docs the labels are data, not a result. The pipeline streams end
    to end (pairs -> component labels -> broadcast/searchsorted labeling ->
    write); a failed run can resume by skipping finished bucket directories.

    ``method``: "jaccard" (exact all-pairs edges, the SQL-oracled variant)
    or "minhash" (banded-LSH verified edges). The DataFrame contract of
    :func:`jaccard_dedup_keep` / :func:`minhash_dedup_keep` is unchanged —
    both paths share :func:`_labeled_dataset`."""
    if method == "jaccard":
        pairs = ngram_jaccard_exact_pairs(
            sf_dir, k=3, jaccard_threshold=jaccard_threshold
        )
    elif method == "minhash":
        pairs = minhash_lsh_dup_pairs(sf_dir, jaccard_threshold)
    else:
        raise ValueError(f"unknown dedup method: {method!r}")

    def with_bucket(t: pa.Table) -> pa.Table:
        b = t["doc_id"].to_numpy().astype(np.int64) % n_buckets
        return t.append_column("bucket", pa.array(b, type=pa.int32()))

    ds = _labeled_dataset(sf_dir, pairs).map_batches(
        with_bucket, batch_format="pyarrow"
    )
    ds.write_parquet(out_dir, partition_cols=["bucket"])
    return out_dir


def minhash_dedup_keep(sf_dir: str, jaccard_threshold: float = 0.5) -> pd.DataFrame:
    """Connected-component dedup over verified near-dup pairs: each doc maps
    to its cluster representative (min doc_id). Union-find over the tiny
    edge set on the driver; labeling is broadcast + vectorized map_batches
    (see ``_label_components`` — no corpus-scale driver collect)."""
    pairs = minhash_lsh_dup_pairs(sf_dir, jaccard_threshold)
    return _label_components(sf_dir, pairs)


class SimHasher:
    """64-bit SimHash per doc (Charikar): sign of per-bit weighted sums of
    token hashes; vectorized with one reduceat over the flattened corpus.

    Token hash is md5-derived by default (byte-identical to the DuckDB
    oracle, see ``ops.text._tok_hashes``); ``hash_fn="fast"`` switches to
    the vectorized siphash for large corpora.
    """

    def __init__(self, hash_fn: str = "md5"):
        self.hash_fn = hash_fn

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from canal_ray.ops.text import _tok_hashes

        toks_per_doc = [t.split() for t in batch["text"].tolist()]
        lens = np.array([max(1, len(t)) for t in toks_per_doc])
        flat = [w for t in toks_per_doc for w in (t if t else [""])]
        h = _tok_hashes(flat, self.hash_fn)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        pm = 2 * bits - 1  # +/-1 per bit
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        sums = np.add.reduceat(pm, starts, axis=0)  # (n_docs, 64)
        sig = (sums > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=np.uint64))
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "simhash": sig.astype(np.int64),  # two's-complement carrier
            }
        )


def simhash_docs(sf_dir: str, hash_fn: str = "md5") -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        SimHasher, fn_constructor_args=(hash_fn,), batch_format="pandas",
        concurrency=2, max_restarts=0
    ).to_pandas()


def embedding_neardup_pairs(
    sf_dir: str, threshold: float = 0.4, n_blocks: int = 8,
    exchange_dir: str | None = None,
) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs — EXACT all-pairs via a distributed
    block-pair grid (the standard distributed similarity-join/matmul layout).

    Phase 1 (scatter): stream the embeddings table, L2-normalize per batch,
    and write each row into its ``vec_id % n_blocks`` block as parquet
    fragments — the corpus is never materialized on the driver or broadcast
    whole (the r1 anti-pattern this replaces).

    ``exchange_dir`` (or ``$CANAL_EXCHANGE_DIR``) is where the block
    fragments land. On a multi-node cluster this MUST be shared storage —
    scatter tasks and grid tasks run on different nodes, and a node-local
    default like /tmp would leave each grid task reading only its own node's
    fragments (silently missing pairs). The single-node default is /tmp.
    Phase 2 (grid): one task per block pair (i <= j) loads exactly two
    blocks, scores their cross product with one matmul, and emits pairs over
    the threshold. Per-task memory is O((n/B)^2 scores + 2 n/B vectors);
    total work O(n^2) — inherent to the exact contract. At 10^10 vectors the
    same scatter feeds the LSH/IVF candidate machinery in ``ops.ann`` instead
    of the full grid; the exact grid remains the small-scale oracle.
    """
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    root = exchange_dir or os.environ.get("CANAL_EXCHANGE_DIR", "/tmp")
    work = tempfile.mkdtemp(prefix="neardup_blocks_", dir=root)
    try:
        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

        def scatter(b: pd.DataFrame) -> pd.DataFrame:
            import hashlib as _hl
            import tempfile as _tf

            ids = b["vec_id"].to_numpy()
            M = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            blocks = (ids % n_blocks).astype(np.int64)
            written = []
            for blk in np.unique(blocks):
                m = blocks == blk
                d = os.path.join(work, f"b{blk:03d}")
                os.makedirs(d, exist_ok=True)
                # fragment name is a pure function of its content ids and the
                # write is tmp+rename: a Ray task RETRY overwrites the same
                # file instead of adding a duplicate set of vectors (a
                # uuid-named side-effecting write is not retry-idempotent)
                frag_id = _hl.sha256(np.sort(ids[m]).tobytes()).hexdigest()[:16]
                path = os.path.join(d, f"frag_{frag_id}.parquet")
                # NOT a .parquet suffix: load_block dataset-discovers the dir
                fd, tmp = _tf.mkstemp(dir=d, prefix=".inflight_", suffix=".tmp")
                os.close(fd)
                pq.write_table(
                    pa.table(
                        {
                            "vec_id": pa.array(ids[m], type=pa.int64()),
                            "emb": pa.array(M[m].tolist(), type=pa.list_(pa.float64())),
                        }
                    ),
                    tmp,
                )
                os.replace(tmp, path)
                written.append(int(blk))
            return pd.DataFrame({"block": written})

        present = sorted(set(ds.map_batches(scatter, batch_format="pandas").to_pandas()["block"]))

        def load_block(blk: int) -> tuple[np.ndarray, np.ndarray]:
            d = os.path.join(work, f"b{blk:03d}")
            t = pq.read_table(d)
            ids = t["vec_id"].to_numpy()
            M = np.stack(t["emb"].to_numpy(zero_copy_only=False))
            return ids, M

        grid = [{"i": i, "j": j} for i in present for j in present if i <= j]

        def score_pair(b: pd.DataFrame) -> pd.DataFrame:
            out_a, out_b = [], []
            for i, j in zip(b["i"], b["j"]):
                ids_i, Mi = load_block(int(i))
                ids_j, Mj = (ids_i, Mi) if i == j else load_block(int(j))
                S = Mi @ Mj.T
                qa, qb = np.nonzero(S > threshold)
                va, vb = ids_i[qa], ids_j[qb]
                if i == j:  # both orientations + self present: keep upper tri
                    keep = va < vb
                    out_a.append(va[keep])
                    out_b.append(vb[keep])
                else:  # disjoint blocks, one orientation: order each pair
                    out_a.append(np.minimum(va, vb))
                    out_b.append(np.maximum(va, vb))
            return pd.DataFrame(
                {
                    "vec_a": np.concatenate(out_a).astype("int64") if out_a else
                    np.array([], dtype="int64"),
                    "vec_b": np.concatenate(out_b).astype("int64") if out_b else
                    np.array([], dtype="int64"),
                }
            )

        out = (
            rd.from_items(grid)
            .map_batches(score_pair, batch_format="pandas", batch_size=1)
            .to_pandas()
        )
        if out.empty:
            return pd.DataFrame(
                {"vec_a": pd.Series([], dtype="int64"), "vec_b": pd.Series([], dtype="int64")}
            )
        return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def jaccard_dedup_keep(sf_dir: str, jaccard_threshold: float = 0.5) -> pd.DataFrame:
    """Connected-component dedup over the EXACT all-pairs Jaccard edges —
    the SQL-oracle-checkable variant of ``minhash_dedup_keep`` (the oracle
    computes the same components via a recursive min-label CTE). Each doc
    maps to its cluster representative (min doc_id).

    Union-find over the tiny edge set on the driver; labeling is broadcast +
    vectorized map_batches (see ``_label_components`` — no corpus-scale
    driver collect)."""
    pairs = ngram_jaccard_exact_pairs(sf_dir, k=3, jaccard_threshold=jaccard_threshold)
    return _label_components(sf_dir, pairs)


def dedup_labels_lake_summary(sf_dir: str, n_buckets: int = 16) -> pd.DataFrame:
    """queries() entry for the PRODUCTION output path of dedup-keep: the
    labeled corpus is written as hash-bucketed partitioned parquet
    (:func:`dedup_labels_to_parquet`), read back, and summarized per bucket
    (doc count, dup count). Self-oracled (size-gated): the written rows must
    equal the DataFrame contract of :func:`jaccard_dedup_keep` exactly."""
    import hashlib
    import shutil

    from canal_ray.ops.util import parquet_num_rows, self_oracle_enabled

    st = os.stat(f"{sf_dir}/documents.parquet")
    key = hashlib.sha256(
        f"{os.path.abspath(sf_dir)}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    out_dir = f"/tmp/canal_ray_labels_{key}"
    # write_parquet APPENDS into an existing directory; the lake path is
    # rewritten fresh per call so a re-invocation cannot double the rows
    shutil.rmtree(out_dir, ignore_errors=True)
    dedup_labels_to_parquet(sf_dir, out_dir, method="jaccard", n_buckets=n_buckets)

    # summary is DISTRIBUTED (per-batch partial groupby -> tiny driver
    # fold): the labeled corpus never lands on the driver on the scale path
    def bucket_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("bucket", as_index=False).agg(
            n_docs=("doc_id", "size"), n_dups=("is_dup", "sum")
        )

    parts = (
        rd.read_parquet(out_dir)
        .map_batches(bucket_partial, batch_format="pandas")
        .to_pandas()  # bounded: n_blocks x n_buckets rows
    )
    out = parts.groupby("bucket", as_index=False)[["n_docs", "n_dups"]].sum()
    out["bucket"] = out["bucket"].astype("int64")
    out[["n_docs", "n_dups"]] = out[["n_docs", "n_dups"]].astype("int64")
    out = out.sort_values("bucket").reset_index(drop=True)

    if self_oracle_enabled(
        parquet_num_rows(f"{sf_dir}/documents.parquet"), "dedup_labels_lake_summary"
    ):
        got = pd.read_parquet(out_dir)  # fixture-scale verification read
        got["bucket"] = got["bucket"].astype("int64")
        want = jaccard_dedup_keep(sf_dir)
        lake_rows = (
            got[["doc_id", "dup_of", "is_dup"]]
            .astype({"doc_id": "int64", "dup_of": "int64", "is_dup": "bool"})
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        if not lake_rows.equals(want) or not (got["bucket"] == got["doc_id"] % n_buckets).all():
            raise AssertionError("lake-written labels diverged from the DataFrame contract")
    return out


def dup_span_token_stats(
    sf_dir: str, k: int = 8, max_df: int = 256, n_shards: int = 64
) -> pd.DataFrame:
    """SUBSTRING-level dedup statistics (the ExactSubstr shape of Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better",
    public algorithm — window-fingerprint variant): for every document, how
    many of its tokens sit inside a ``k``-token window whose exact token
    sequence occurs MORE THAN ONCE anywhere in the corpus. Doc-level dedup
    (exact/MinHash/Jaccard above) misses boilerplate repeated INSIDE
    otherwise-unique documents; this is the operator that finds it.

    Scale shape (same two bounded exchanges as the exact-Jaccard plan):
      1. map_batches: per doc, vectorized rolling polynomial hash of every
         k-token window (one ``_roll`` pass over pre-hashed tokens) ->
         (window_hash, doc_id, pos) rows, sharded BY window hash;
      2. groupby(hash-shard): within a shard the bucket size of one hash IS
         its global occurrence count — keep positions of hashes seen 2..
         ``max_df`` times (the df cap bounds the hot-boilerplate blowup the
         same way exact-Jaccard caps hot shingles — capped windows are
         DROPPED from the duplicated set, never partially counted);
      3. groupby(doc-shard): per doc, coverage = union of [pos, pos+k)
         via one vectorized cummax pass over sorted window starts.

    Output: (doc_id, n_tokens, n_dup_tokens, dup_ratio). Self-oracled
    in-process (size-gated): a sequential dict recompute over the corpus
    must match every row exactly."""
    from canal_ray.ops.util import parquet_num_rows, self_oracle_enabled

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _tok_window_hashes(text: str) -> tuple[int, np.ndarray]:
        toks = text.split() if isinstance(text, str) else []
        if len(toks) < k:
            return len(toks), np.zeros(0, dtype=np.uint64)
        with np.errstate(over="ignore"):
            hw = pd.util.hash_array(np.array(toks, dtype=object)).astype(np.uint64)
            return len(toks), _roll(hw, k)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        per_doc = [_tok_window_hashes(t) for t in b["text"].tolist()]
        n_tok = np.array([n for n, _ in per_doc], dtype=np.int64)
        lens = np.array([len(w) for _, w in per_doc], dtype=np.int64)
        doc = b["doc_id"].to_numpy().astype(np.int64)
        if lens.sum() == 0:
            return pd.DataFrame(
                {"wh": pd.Series([], dtype="uint64"),
                 "doc_id": pd.Series([], dtype="int64"),
                 "pos": pd.Series([], dtype="int64"),
                 "n_tokens": pd.Series([], dtype="int64"),
                 "_shard": pd.Series([], dtype="int64")}
            )
        wh = np.concatenate([w for _, w in per_doc if len(w)])
        return pd.DataFrame(
            {
                "wh": wh,
                "doc_id": np.repeat(doc, lens),
                "pos": np.concatenate([np.arange(n, dtype=np.int64) for n in lens if n]),
                "n_tokens": np.repeat(n_tok, lens),
                "_shard": (wh % np.uint64(n_shards)).astype(np.int64),
            }
        )

    rows = ds.map_batches(explode, batch_format="pandas")

    def dup_positions(g: pd.DataFrame) -> pd.DataFrame:
        # bucket size within one hash-shard == the hash's GLOBAL df
        df_per_hash = g.groupby("wh")["wh"].transform("size")
        keep = (df_per_hash >= 2) & (df_per_hash <= max_df)
        out = g.loc[keep, ["doc_id", "pos", "n_tokens"]].copy()
        out["_dshard"] = (
            pd.util.hash_array(out["doc_id"].to_numpy()) % n_shards
        ).astype("int64")
        return out

    dup = rows.groupby("_shard").map_groups(dup_positions, batch_format="pandas")

    def per_doc_coverage(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "pos"]).reset_index(drop=True)
        doc = g["doc_id"].to_numpy()
        pos = g["pos"].to_numpy()
        new_doc = np.concatenate([[True], doc[1:] != doc[:-1]])
        # union of [pos, pos+k) intervals per doc in one pass: each window
        # contributes k tokens minus its overlap with the previous window
        prev_end = np.concatenate([[0], pos[:-1] + k])
        prev_end[new_doc] = 0
        covered = np.minimum(k, np.maximum(pos + k - np.maximum(prev_end, pos), 0))
        covered = np.where(new_doc, k, covered)
        out = pd.DataFrame({"doc_id": doc, "covered": covered})
        agg = out.groupby("doc_id", as_index=False)["covered"].sum()
        n_tok = g.drop_duplicates("doc_id").set_index("doc_id")["n_tokens"]
        agg["n_tokens"] = agg["doc_id"].map(n_tok).astype("int64")
        return agg.rename(columns={"covered": "n_dup_tokens"})

    cov = dup.groupby("_dshard").map_groups(per_doc_coverage, batch_format="pandas").to_pandas()

    corpus = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tok_counts(b: pd.DataFrame) -> pd.DataFrame:
        n = b["text"].str.strip().str.split().str.len().fillna(0).astype("int64")
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(), "n_tokens": n})

    allc = corpus.map_batches(tok_counts, batch_format="pandas").to_pandas()
    out = allc.merge(
        cov[["doc_id", "n_dup_tokens"]], on="doc_id", how="left"
    ).fillna({"n_dup_tokens": 0})
    out["n_dup_tokens"] = out["n_dup_tokens"].astype("int64")
    out["dup_ratio"] = np.round(
        out["n_dup_tokens"] / np.maximum(out["n_tokens"], 1), 6
    )
    out = out.sort_values("doc_id").reset_index(drop=True)

    # ---- sequential oracle (exact recompute, size-gated) -------------------
    if self_oracle_enabled(
        parquet_num_rows(f"{sf_dir}/documents.parquet"), "dup_span_token_stats"
    ):
        seq = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        counts: dict = {}
        per_doc_wh: dict = {}
        for did, text in zip(seq["doc_id"], seq["text"]):
            n, wh = _tok_window_hashes(text)
            per_doc_wh[int(did)] = (n, wh)
            for h in wh:
                counts[int(h)] = counts.get(int(h), 0) + 1
        for _, r in out.iterrows():
            n, wh = per_doc_wh[int(r["doc_id"])]
            covered = np.zeros(n, dtype=bool)
            for p, h in enumerate(wh):
                if 2 <= counts[int(h)] <= max_df:
                    covered[p : p + k] = True
            if int(covered.sum()) != int(r["n_dup_tokens"]) or n != int(r["n_tokens"]):
                raise AssertionError(
                    f"dup-span coverage diverged for doc {int(r['doc_id'])}"
                )
    return out
