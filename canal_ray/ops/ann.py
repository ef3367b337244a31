"""Approximate-nearest-neighbor search over the ``embeddings`` table.

Brute-force cosine top-k is the exact baseline: the query matrix is broadcast
once (``ray.put``), every batch does one numpy matmul + per-query partial
top-k, and the tiny partials reduce in a final grouped top-k — no shuffle of
the embedding corpus itself. The LSH-bucketed variant is the scale path:
random-hyperplane signatures bound each query's candidate set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from canal_ray.ops.util import self_oracle_enabled


def _matrix(series: pd.Series) -> np.ndarray:
    M = np.stack(series.to_numpy()).astype(np.float64)
    return M / np.linalg.norm(M, axis=1, keepdims=True)


def _load_queries(sf_dir: str, n_queries: int):
    # the query set is small by definition (broadcast side); read it with a
    # pushed-down row filter so only matching row groups are decoded
    import pyarrow.dataset as pads

    dset = pads.dataset(f"{sf_dir}/embeddings.parquet")
    t = dset.to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < n_queries
    )
    q = t.to_pandas().sort_values("vec_id")
    return q["vec_id"].to_numpy(), _matrix(q["embedding"])



def _merge_topk(partials, k: int) -> pd.DataFrame:
    """Final per-query top-k from the BOUNDED partial set.

    The partials are at most n_blocks x n_queries x (k+1) rows — partial
    top-k results, never the corpus — so the final reduction collects them
    and runs ONE vectorized pandas sort on the driver. This replaces a
    ``groupby(query_id)`` sort AllToAll that paid a full exchange for an
    8-key reduction and whose internal empty pandas blocks carried no
    schema (executor RefBundle warnings). At 10^5+ blocks the scale path
    is a tree merge (per-partition top-k inside ``map_batches``, then this
    same final merge over the shrunken partials) — same semantics.
    """
    g = partials.to_pandas()
    if g.empty:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "vec_id": pd.Series([], dtype="int64"),
                "rank": pd.Series([], dtype="int64"),
            }
        )
    g = g.sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
    g = g.groupby("query_id", as_index=False, sort=False).head(k).reset_index(drop=True)
    g["rank"] = g.groupby("query_id").cumcount() + 1
    return g[["query_id", "vec_id", "rank"]].astype(
        {"query_id": "int64", "vec_id": "int64", "rank": "int64"}
    )


def _empty_partials() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "query_id": pd.Series([], dtype="int64"),
            "vec_id": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="float64"),
        }
    )


class BruteForceScorer:
    """Actor-pool stage: per-batch cosine scores + per-query partial top-k.

    The query matrix rides IN the constructor args BY VALUE (it is tiny:
    n_queries x d floats): an ObjectRef constructor arg on a restartable
    actor is a restart hazard — if the ref is lost the actor can never be
    reconstructed (ray#53727). Broadcast-by-ref is for big payloads only.
    """

    def __init__(self, queries, k: int):
        self.qids, self.Q = queries
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        M = _matrix(batch["embedding"])
        ids = batch["vec_id"].to_numpy()
        S = self.Q @ M.T  # (n_q, b)
        k = min(self.k + 1, S.shape[1])  # +1 to survive dropping self-matches
        part = np.argpartition(-S, k - 1, axis=1)[:, :k]
        rows = {
            "query_id": np.repeat(self.qids, k),
            "vec_id": ids[part].ravel(),
            "score": np.take_along_axis(S, part, axis=1).ravel(),
        }
        df = pd.DataFrame(rows)
        return df[df["query_id"] != df["vec_id"]]


def ann_cosine_topk(sf_dir: str, k: int = 10, n_queries: int = 8) -> pd.DataFrame:
    """Exact cosine top-k per query; output (query_id, vec_id, rank)."""
    queries = _load_queries(sf_dir, n_queries)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        BruteForceScorer,
        fn_constructor_args=(queries, k),
        batch_format="pandas",
        concurrency=2,
        # Ray Data's MapWorker puts fn_constructor_args in the object store
        # even when passed by value; restarts with store-held ctor args are
        # the ray#53727 hazard. The stage is stateless-per-batch, so a lost
        # actor is simply re-run by lineage — no restart needed.
        max_restarts=0,
    )

    return _merge_topk(partials, k)


# --- LSH-bucketed variant (the 100 TB path) --------------------------------

_N_PLANES = 6
_PLANES_SEED = 777


def _signatures(M: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (M @ planes.T) > 0
    return bits @ (1 << np.arange(_N_PLANES))


def ann_lsh_topk(sf_dir: str, k: int = 10, n_queries: int = 8, probes: int = 2) -> pd.DataFrame:
    """Random-hyperplane LSH ANN: score only vectors whose signature is
    within ``probes`` bit flips of the query signature (multi-probe).

    Recall is traded for candidate-set size; tests assert overlap with the
    exact baseline (near-random test embeddings have weak locality, so the
    plane count is small and multiprobe wide). Bucketing is a plain int
    column — at scale the candidate restriction happens with a bucket
    groupby co-partitioning corpus and queries instead of the per-batch
    mask used here.
    """
    from itertools import combinations

    qids, Q = _load_queries(sf_dir, n_queries)
    rng = np.random.default_rng(_PLANES_SEED)
    d = Q.shape[1]
    planes = rng.standard_normal((_N_PLANES, d))
    qsig = _signatures(Q, planes)
    # multiprobe: all signatures within `probes` Hamming distance
    allowed = [set([int(s)]) for s in qsig]
    for i, s in enumerate(qsig):
        for r in range(1, probes + 1):
            for flips in combinations(range(_N_PLANES), r):
                m = 0
                for b in flips:
                    m |= 1 << b
                allowed[i].add(int(s) ^ m)
    ref = ray.put((qids, Q, planes, [np.array(sorted(a)) for a in allowed]))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        from canal_ray.ops.util import cached_get

        _qids, _Q, _planes, _allowed = cached_get(ref)
        M = _matrix(batch["embedding"])
        ids = batch["vec_id"].to_numpy()
        sig = _signatures(M, _planes)
        frames = []
        for qi, qid in enumerate(_qids):
            mask = np.isin(sig, _allowed[qi]) & (ids != qid)
            if not mask.any():
                continue
            S = _Q[qi] @ M[mask].T
            frames.append(
                pd.DataFrame({"query_id": qid, "vec_id": ids[mask], "score": S})
            )
        if not frames:
            return _empty_partials()
        return pd.concat(frames, ignore_index=True)

    partials = ds.map_batches(per_batch, batch_format="pandas")

    return _merge_topk(partials, k)


def _kmeans(X: np.ndarray, k: int, iters: int = 10, seed: int = 4242) -> np.ndarray:
    """Seeded Lloyd's k-means on unit vectors (public algorithm); returns
    normalized centroids. Deterministic: fixed init sample + iteration count."""
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(k, len(X)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def ann_ivf_topk(
    sf_dir: str,
    k: int = 10,
    n_queries: int = 8,
    n_clusters: int = 16,
    nprobe: int = 4,
    train_sample: int = 2_048,
) -> pd.DataFrame:
    """IVF ANN (the classic inverted-file index, public design): centroids
    trained on a driver-side sample and broadcast; each batch assigns its
    vectors to centroids and scores a query only against vectors in the
    query's ``nprobe`` nearest clusters. At 10^10 scale the assignment
    becomes a persisted bucket column and probing a bucket-groupby."""
    qids, Q = _load_queries(sf_dir, n_queries)
    # training sample: bounded streaming read (limit pushes into the scan) —
    # never the whole table on the driver
    sample = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .limit(train_sample)
        .to_pandas()
    )
    X = _matrix(sample["embedding"])
    C = _kmeans(X, n_clusters)
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (n_q, nprobe)
    ref = ray.put((qids, Q, C, probe))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        from canal_ray.ops.util import cached_get

        _qids, _Q, _C, _probe = cached_get(ref)
        M = _matrix(batch["embedding"])
        ids = batch["vec_id"].to_numpy()
        assign = np.argmax(M @ _C.T, axis=1)
        frames = []
        for qi, qid in enumerate(_qids):
            mask = np.isin(assign, _probe[qi]) & (ids != qid)
            if not mask.any():
                continue
            S = _Q[qi] @ M[mask].T
            frames.append(pd.DataFrame({"query_id": qid, "vec_id": ids[mask], "score": S}))
        if not frames:
            return _empty_partials()
        return pd.concat(frames, ignore_index=True)

    partials = ds.map_batches(per_batch, batch_format="pandas")

    return _merge_topk(partials, k)


# --- persisted IVF index (the 10^10-scale path, made real) ------------------

def ann_ivf_build(
    sf_dir: str,
    index_dir: str,
    n_clusters: int = 16,
    train_sample: int = 2_048,
) -> str:
    """Build a PERSISTED inverted-file index: centroids + the corpus written
    as bucket-partitioned parquet (one directory per cluster). Queries then
    read ONLY their probed buckets' directories — candidate restriction
    happens at the READ (directory pruning), not per batch in memory. The
    build is a single streaming pass; resumable via a completion marker
    (partial output is rebuilt, never trusted)."""
    import os
    import shutil

    done = os.path.join(index_dir, "_COMPLETE")
    if os.path.exists(done):
        return index_dir
    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)

    sample = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .limit(train_sample)
        .to_pandas()
    )
    C = _kmeans(_matrix(sample["embedding"]), n_clusters)
    np.save(os.path.join(index_dir, "centroids.npy"), C)

    cref = ray.put(C)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        M = _matrix(batch["embedding"])
        from canal_ray.ops.util import cached_get

        b = np.argmax(M @ cached_get(cref).T, axis=1).astype(np.int32)
        # bucket rides BOTH as the hive partition key (directory pruning)
        # and as a data column (partition-col values are path-encoded and
        # dropped from the files themselves)
        return batch.assign(bucket=b, bucket_id=b)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ds.map_batches(assign, batch_format="pandas").write_parquet(
        os.path.join(index_dir, "buckets"), partition_cols=["bucket"]
    )
    with open(done, "w") as f:
        f.write("ok")
    return index_dir


def ann_ivf_indexed_topk(
    sf_dir: str,
    k: int = 10,
    n_queries: int = 8,
    n_clusters: int = 16,
    nprobe: int = 4,
    train_sample: int = 2_048,
    index_root: str | None = None,
) -> pd.DataFrame:
    """IVF query against the persisted index: read ONLY the probed bucket
    directories, score, grouped top-k. Must return exactly what the
    in-line :func:`ann_ivf_topk` returns (same seeded centroids) — asserted
    in tests as an equivalence oracle."""
    import hashlib
    import os

    # like every exchange/index location: node-local /tmp is only valid on a
    # single node — point $CANAL_EXCHANGE_DIR (or index_root) at shared
    # storage on a real cluster (build tasks and probe reads cross nodes)
    if index_root is None:
        index_root = os.path.join(
            os.environ.get("CANAL_EXCHANGE_DIR", "/tmp"), "canal_ray_ann"
        )
    # the key includes the source file's identity (size + mtime), not just
    # its path: a regenerated embeddings.parquet at the same path must not
    # be served by a stale completed index
    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    key = hashlib.sha256(
        f"{os.path.abspath(sf_dir)}|{st.st_size}|{st.st_mtime_ns}|"
        f"{n_clusters}|{train_sample}|v1".encode()
    ).hexdigest()[:12]
    index_dir = ann_ivf_build(
        sf_dir, os.path.join(index_root, key), n_clusters, train_sample
    )

    qids, Q = _load_queries(sf_dir, n_queries)
    C = np.load(os.path.join(index_dir, "centroids.npy"))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (n_q, nprobe)

    wanted = sorted({int(b) for row in probe for b in row})
    # expand probed bucket directories to their files (read_parquet takes a
    # flat file list); unprobed buckets are never opened — the point
    paths = []
    for b in wanted:
        d = os.path.join(index_dir, "buckets", f"bucket={b}")
        if os.path.isdir(d):
            paths += [
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            ]
    ref = ray.put((qids, Q, probe))

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        from canal_ray.ops.util import cached_get

        _qids, _Q, _probe = cached_get(ref)
        M = _matrix(batch["embedding"])
        ids = batch["vec_id"].to_numpy()
        buckets = batch["bucket_id"].to_numpy()
        frames = []
        for qi, qid in enumerate(_qids):
            mask = np.isin(buckets, _probe[qi]) & (ids != qid)
            if not mask.any():
                continue
            S = _Q[qi] @ M[mask].T
            frames.append(pd.DataFrame({"query_id": qid, "vec_id": ids[mask], "score": S}))
        if not frames:
            return _empty_partials()
        return pd.concat(frames, ignore_index=True)

    ds = rd.read_parquet(paths, columns=["vec_id", "embedding", "bucket_id"])
    partials = ds.map_batches(per_batch, batch_format="pandas")

    return _merge_topk(partials, k)


def label_centroid_norms(sf_dir: str) -> pd.DataFrame:
    """Per-label centroid L2 norms — grouped vector aggregate via per-batch
    partial sums (one (label, sumvec, n) row per label per batch)."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        M = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        lab = b["label"].to_numpy()
        out = []
        for l in np.unique(lab):
            m = lab == l
            out.append({"label": int(l), "sumvec": M[m].sum(axis=0), "n": int(m.sum())})
        return pd.DataFrame(out)

    parts = ds.map_batches(partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        vec = np.stack(g["sumvec"].to_numpy()).sum(axis=0)
        n = int(g["n"].sum())
        return pd.DataFrame(
            {
                "label": [int(g["label"].iloc[0])],
                "n": [n],
                "centroid_norm": [float(np.linalg.norm(vec / n))],
            }
        )

    df = parts.groupby("label").map_groups(merge, batch_format="pandas").to_pandas()
    df["label"] = df["label"].astype("int32")
    df["n"] = df["n"].astype("int64")
    df["centroid_norm"] = np.round(df["centroid_norm"], 6)
    return df


def ann_recall_report(sf_dir: str, k: int = 10, n_queries: int = 8) -> pd.DataFrame:
    """Recall@k of each approximate ANN variant against the exact baseline —
    the evaluation pass a production similarity-search deployment runs when
    tuning probes/clusters (public methodology: recall@k vs brute force).

    Deterministic given the fixed seeds the variants use; output one row per
    (method, query_id) plus a 'method'-level mean (query_id = -1)."""
    exact = ann_cosine_topk(sf_dir, k=k, n_queries=n_queries)
    truth = {
        q: set(g["vec_id"].to_numpy())
        for q, g in exact.groupby("query_id")
    }
    rows = []
    for method, df in (
        ("lsh", ann_lsh_topk(sf_dir, k=k, n_queries=n_queries)),
        ("ivf", ann_ivf_topk(sf_dir, k=k, n_queries=n_queries)),
        ("ivf_indexed", ann_ivf_indexed_topk(sf_dir, k=k, n_queries=n_queries)),
    ):
        per_q = []
        for q, g in df.groupby("query_id"):
            got = set(g["vec_id"].to_numpy())
            r = len(got & truth.get(q, set())) / max(1, len(truth.get(q, set())))
            per_q.append(r)
            rows.append({"method": method, "query_id": int(q), "recall": round(r, 4)})
        rows.append(
            {
                "method": method,
                "query_id": -1,
                "recall": round(float(np.mean(per_q)) if per_q else 0.0, 4),
            }
        )
    return (
        pd.DataFrame(rows)
        .sort_values(["method", "query_id"])
        .reset_index(drop=True)
    )


def embedding_cluster_assign(sf_dir: str, n_centroids: int = 8) -> pd.DataFrame:
    """Nearest-centroid assignment (one Lloyd E-step, the building block of
    distributed k-means / IVF training): every embedding assigned to its
    max-cosine centroid. Centroids are the deterministic seed set
    ``vec_id < n_centroids`` (the same convention as ``_load_queries``), so
    BOTH sides of the oracle compute the identical assignment — DuckDB
    expresses it as a cross join + QUALIFY argmax, Ray as ONE broadcast
    matmul + argmax per batch: no join shuffle, no per-row Python.
    Tie-break: lowest centroid id (ties are measure-zero for real data but
    the rule is pinned anyway)."""
    # centroids ride by value (tiny): ObjectRef constructor args on a
    # restartable actor are a restart hazard (see BruteForceScorer)
    centroids = _load_queries(sf_dir, n_centroids)

    class Assigner:
        def __init__(self, c):
            self.cids, self.C = c

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            M = _matrix(batch["embedding"])
            S = M @ self.C.T  # (b, n_centroids)
            best = np.argmax(S, axis=1)  # first (lowest id) wins ties
            # similarity itself is excluded from the output: DuckDB's
            # list_cosine_similarity is float32 and its repr diverges from
            # the float64 matmul in the last digits — the discrete
            # assignment is the (robust) contract
            return pd.DataFrame(
                {
                    "vec_id": batch["vec_id"].to_numpy(),
                    "centroid_id": self.cids[best],
                }
            )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = ds.map_batches(
        Assigner,
        fn_constructor_args=(centroids,),
        batch_format="pandas",
        concurrency=2,
        max_restarts=0,  # see BruteForceScorer: ray#53727
    ).to_pandas()
    return (
        df.astype({"vec_id": "int64", "centroid_id": "int64"})
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


def embedding_kmeans(
    sf_dir: str, n_centroids: int = 8, n_iters: int = 3
) -> pd.DataFrame:
    """Distributed k-means (full Lloyd loop, ``n_iters`` rounds) — the
    iterative-algorithm shape on Ray Data: per round, an E-step assignment
    (broadcast-centroid matmul per batch, like ``embedding_cluster_assign``)
    fused with M-step PARTIAL sums in the same pass, one tiny grouped
    reduce over (centroid, dim) rows (<= k x d, never corpus-scale), and a
    driver-side centroid update (k x d doubles — bounded state, the only
    thing that legitimately lives on the driver in an iterative loop).
    Initialization is the deterministic seed set ``vec_id < k`` on the
    cosine sphere; all arithmetic float64.

    In-process oracle on every call: a sequential numpy recompute of the
    identical algorithm must reach the SAME final assignment. Cross-batch
    float64 sums can differ from the sequential order by ulps (commutative
    but not associative), so the DISCRETE assignment — robust unless two
    centroids tie within that ulp noise, which real embeddings never do —
    is the contract, exactly like ``embedding_cluster_assign``."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    cids, C = _load_queries(sf_dir, n_centroids)  # unit-norm float64 seeds

    from canal_ray.ops.util import cached_get

    def em_step(batch: pd.DataFrame, cref) -> pd.DataFrame:
        """One fused E+M pass: per-batch assignment + (centroid, dim)
        partial sums and counts. A stateless TASK stage (not an actor
        pool): an iterative loop launches one pipeline per round, and
        per-round actor-pool spin-up dwarfs the compute — the broadcast
        centroids come via cached_get (fetched once per worker process,
        the same pattern as the other broadcast task stages)."""
        Cw = cached_get(cref)
        M = _matrix(batch["embedding"])
        best = np.argmax(M @ Cw.T, axis=1)
        d = M.shape[1]
        k = Cw.shape[0]
        sums = np.zeros((k, d))
        np.add.at(sums, best, M)
        counts = np.bincount(best, minlength=k).astype(np.int64)
        nz = np.flatnonzero(counts)
        return pd.DataFrame(
            {
                "centroid": np.repeat(nz, d),
                "dim": np.tile(np.arange(d, dtype=np.int64), len(nz)),
                "s": sums[nz].ravel(),
                "n": np.repeat(counts[nz], d),
            }
        )

    for _ in range(n_iters):
        cref = ray.put(C)
        # each block pre-reduces to <= k x d rows, so the merge input is
        # n_blocks x k x d TINY rows — a driver-side pandas sum, NOT a Ray
        # groupby: a distributed AllToAll costs a fixed multi-second setup
        # per execution and an iterative loop pays it every round (measured
        # 5s/round vs 0.5s for the whole pass). At extreme block counts the
        # escalation is a tree-reduce (repartition to sqrt(n) then sum) —
        # the driver only ever holds partials, never vectors.
        part = ds.map_batches(
            em_step, fn_kwargs={"cref": cref}, batch_format="pandas"
        ).to_pandas()
        part = (
            part.groupby(["centroid", "dim"], as_index=False)
            .agg(s=("s", "sum"), n=("n", "sum"))
            .sort_values(["centroid", "dim"])
        )
        newC = C.copy()
        for c, g in part.groupby("centroid"):
            v = g["s"].to_numpy() / int(g["n"].iloc[0])
            nrm = np.linalg.norm(v)
            if nrm > 0:
                newC[int(c)] = v / nrm
        C = newC

    # final assignment with converged centroids (stateless task stage too)
    cref = ray.put((cids, C))

    def final_assign(batch: pd.DataFrame, cref) -> pd.DataFrame:
        f_cids, Cw = cached_get(cref)
        M = _matrix(batch["embedding"])
        best = np.argmax(M @ Cw.T, axis=1)
        return pd.DataFrame(
            {"vec_id": batch["vec_id"].to_numpy(), "centroid_id": f_cids[best]}
        )

    assign = (
        ds.map_batches(final_assign, fn_kwargs={"cref": cref}, batch_format="pandas")
        .to_pandas()
        .astype({"vec_id": "int64", "centroid_id": "int64"})
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    # ------- sequential oracle: identical algorithm, single process -------
    if self_oracle_enabled(len(assign), "kmeans_cluster_assign"):
        full = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        full = full.sort_values("vec_id").reset_index(drop=True)
        X = _matrix(full["embedding"])
        _, C2 = _load_queries(sf_dir, n_centroids)
        for _ in range(n_iters):
            best = np.argmax(X @ C2.T, axis=1)
            for c in range(n_centroids):
                m = best == c
                if m.any():
                    v = X[m].sum(axis=0) / int(m.sum())
                    nrm = np.linalg.norm(v)
                    if nrm > 0:
                        C2[c] = v / nrm
        want = cids[np.argmax(X @ C2.T, axis=1)]
        got = assign.set_index("vec_id").loc[full["vec_id"]]["centroid_id"].to_numpy()
        # tolerance: a ulp-level argmax tie in an INTERMEDIATE round (possible —
        # cross-batch sum order is nondeterministic) moves two centroids by
        # O(1/n) and can legitimately flip a handful of nearby assignments, so
        # exact equality would be a spurious production crash. A real merge bug
        # (lost/duplicated partials) scrambles assignments wholesale; 0.5%
        # separates the two regimes cleanly.
        mismatch = int((got != want).sum())
        if mismatch > max(1, len(want) // 200):
            raise AssertionError(
                f"distributed k-means diverged from sequential Lloyd "
                f"({mismatch}/{len(want)} assignments differ)"
            )

    out = (
        assign.groupby("centroid_id", as_index=False)
        .size()
        .rename(columns={"size": "n_members"})
    )
    out["n_members"] = out["n_members"].astype("int64")
    return out.sort_values("centroid_id").reset_index(drop=True)
