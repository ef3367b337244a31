"""Deduplication ops over ``documents`` (training-data pipeline staples).

Exact (hash groupby), MinHash+LSH (shingle -> minhash -> band-bucket groupby
-> verified Jaccard), SimHash — all public algorithms (Broder 1997; Charikar
2002; Schleimer et al. winnowing), built Ray-Data-first:

  - per-batch work is vectorized numpy (``np.minimum.reduceat`` segment-mins
    for minhash, ``np.add.reduceat`` for simhash bit counts);
  - the only shuffles are the band-bucket / hash groupbys;
  - candidate verification uses the broadcast pattern (``ray.put`` the
    shingle sets of candidate docs once; at 100 TB this becomes a
    co-partitioned pair join — documented, not silently assumed).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

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
    # md5 chosen to match the DuckDB oracle's md5(); at 100 TB scale swap for
    # a vectorized xxhash — the groupby-dedup shape is unchanged
    return texts.map(lambda t: hashlib.md5(t.encode()).hexdigest())


def exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: content hash -> keep min doc_id per hash + dup count."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": batch["doc_id"], "text_md5": _md5(batch["text"])})

    hashed = ds.map_batches(add_hash, batch_format="pandas")

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        return pd.DataFrame(
            {
                "doc_id": [g["doc_id"].iloc[0]],
                "text_md5": [g["text_md5"].iloc[0]],
                "n_dups": [len(g)],
            }
        )

    out = hashed.groupby("text_md5").map_groups(keep_first, batch_format="pandas")
    df = out.to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_dups"] = df["n_dups"].astype("int64")
    return df


def _shingle_hashes(text: str, k: int = 3, mode: str = "word") -> np.ndarray:
    """Hashed shingle set: k-token windows ('word') or char k-grams ('char')."""
    if mode == "char":
        if len(text) < k:
            shingles = [text]
        else:
            shingles = [text[i : i + k] for i in range(len(text) - k + 1)]
    else:
        toks = text.split()
        if len(toks) < k:
            shingles = [" ".join(toks)] if toks else [""]
        else:
            shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(pd.util.hash_array(np.array(shingles, dtype=object)).astype(np.uint64))


class MinHasher:
    """Actor-pool stage: per-doc 64-perm minhash signature, vectorized via
    one flattened (all-shingles x perms) matrix + segment-min reduceat."""

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
    out = ds.map_batches(MinHasher, batch_format="pandas", concurrency=2)
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
        MinHasher, fn_constructor_args=(k, mode), batch_format="pandas", concurrency=2
    )
    bands = sigs.map_batches(_band_rows, batch_format="pandas")

    est_floor = jaccard_threshold - 0.2
    n_shards = 64  # Ray groups = (band, shard); buckets sub-grouped in pandas
    bands = bands.map_batches(
        lambda df: df.assign(shard=(df["band_hash"].to_numpy() % n_shards)),
        batch_format="pandas",
    )

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One Ray group = many band buckets (a shard); buckets resolved with
        a pandas C-path groupby, pair enumeration only for buckets >= 2 docs.
        Avoids Ray's per-group dispatch cost across thousands of tiny buckets."""
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for _, bucket in g.groupby("band_hash", sort=False):
            bucket = bucket.drop_duplicates(subset=["doc_id"])
            if len(bucket) < 2:
                continue
            bucket = bucket.sort_values("doc_id").head(max_bucket)
            ids = bucket["doc_id"].to_numpy()
            S = np.stack(bucket["sig"].to_numpy())
            a, b = np.triu_indices(len(ids), k=1)
            est = (S[a] == S[b]).mean(axis=1)
            keep = est >= est_floor
            if keep.any():
                out_a.append(ids[a[keep]])
                out_b.append(ids[b[keep]])
        if not out_a:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
        )

    pairs = (
        bands.groupby(["band_id", "shard"])
        .map_groups(shard_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
        .reset_index(drop=True)
    )
    empty = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64"),
        }
    )
    if pairs.empty:
        return empty

    # stage 2: exact verify with broadcast shingle sets of the survivors only
    cand_ids = set(pairs["doc_a"]) | set(pairs["doc_b"])

    def collect_shingles(batch: pd.DataFrame) -> pd.DataFrame:
        sub = batch[batch["doc_id"].isin(cand_ids)]
        return pd.DataFrame(
            {
                "doc_id": sub["doc_id"],
                "shingles": sub["text"].map(lambda t: _shingle_hashes(t, k, mode)),
            }
        )

    sh = ds.map_batches(collect_shingles, batch_format="pandas").to_pandas()
    lookup = dict(zip(sh["doc_id"], sh["shingles"]))
    jac = np.zeros(len(pairs))
    for i, (a, b) in enumerate(zip(pairs["doc_a"], pairs["doc_b"])):
        sa, sb = lookup[a], lookup[b]
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        jac[i] = inter / (sa.size + sb.size - inter)
    pairs = pairs.assign(jaccard=np.round(jac, 6))
    out = pairs[pairs["jaccard"] >= jaccard_threshold].reset_index(drop=True)
    return out.astype({"doc_a": "int64", "doc_b": "int64"})


def ngram_jaccard_pairs(
    sf_dir: str, n: int = 5, jaccard_threshold: float = 0.6
) -> pd.DataFrame:
    """Character n-gram Jaccard near-dup pairs (the char-level variant):
    same LSH candidate machinery, char shingles, exact Jaccard verify."""
    return minhash_lsh_dup_pairs(sf_dir, jaccard_threshold, k=n, mode="char")


def minhash_dedup_keep(sf_dir: str, jaccard_threshold: float = 0.5) -> pd.DataFrame:
    """Connected-component dedup over verified near-dup pairs: each doc maps
    to its cluster representative (min doc_id). Union-find on the driver is
    justified because the verified pair set is tiny relative to the corpus
    (at 10^10 docs this becomes iterative min-label propagation via groupby)."""
    pairs = minhash_lsh_dup_pairs(sf_dir, jaccard_threshold)
    ids = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]).to_pandas()
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
    out = ids.copy()
    out["dup_of"] = out["doc_id"].map(lambda d: find(int(d))).astype("int64")
    out["is_dup"] = out["dup_of"] != out["doc_id"]
    return out


class SimHasher:
    """64-bit SimHash per doc (Charikar): sign of per-bit weighted sums of
    token hashes; vectorized with one reduceat over the flattened corpus."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks_per_doc = [t.split() for t in batch["text"].tolist()]
        lens = np.array([max(1, len(t)) for t in toks_per_doc])
        flat = np.concatenate([t if t else [""] for t in toks_per_doc])
        h = pd.util.hash_array(np.array(flat, dtype=object)).astype(np.uint64)
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


def simhash_docs(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(SimHasher, batch_format="pandas", concurrency=2).to_pandas()


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.4) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs: brute-force cosine per batch against
    the broadcast (normalized) full matrix — the O(n^2/P) exact baseline; at
    scale the LSH-bucketed variant in ops.ann bounds candidates."""
    tbl = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    M = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ids = tbl["vec_id"].to_numpy()
    ref = ray.put((ids, M))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def per_batch(b: pd.DataFrame) -> pd.DataFrame:
        all_ids, allM = ray.get(ref)
        Q = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        Q /= np.linalg.norm(Q, axis=1, keepdims=True)
        S = Q @ allM.T
        qa, qb = np.nonzero(S > threshold)
        va, vb = b["vec_id"].to_numpy()[qa], all_ids[qb]
        keep = va < vb  # dedupe symmetric pairs, drop self
        return pd.DataFrame(
            {"vec_a": va[keep].astype("int64"), "vec_b": vb[keep].astype("int64")}
        )

    return ds.map_batches(per_batch, batch_format="pandas").to_pandas().sort_values(
        ["vec_a", "vec_b"]
    ).reset_index(drop=True)
