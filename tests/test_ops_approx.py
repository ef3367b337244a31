"""Behavioral tests for the approximate (non-SQL-expressible) ops:
MinHash+LSH near-dup detection, SimHash, LSH-ANN recall, fingerprints,
language-ID — against a corpus with planted duplicates."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def planted_docs(tmp_path_factory):
    """documents.parquet with exact dups, near dups and distinct docs."""
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    doc_id = 0
    base_texts = []
    for i in range(40):  # distinct base docs
        toks = rng.choice(vocab, size=60, replace=True).tolist()
        base_texts.append(" ".join(toks))
        rows.append({"doc_id": doc_id, "text": base_texts[-1]}); doc_id += 1
    # exact duplicates of the first 5
    for i in range(5):
        rows.append({"doc_id": doc_id, "text": base_texts[i]}); doc_id += 1
    # near duplicates: change 3 of 60 tokens of docs 5..9
    for i in range(5, 10):
        toks = base_texts[i].split()
        for j in (7, 23, 41):
            toks[j] = "CHANGED" + str(j)
        rows.append({"doc_id": doc_id, "text": " ".join(toks)}); doc_id += 1
    df = pd.DataFrame(rows)
    df["lang"] = "en"; df["source"] = "synth"; df["n_chars"] = df["text"].str.len()
    d = tmp_path_factory.mktemp("planted")
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_minhash_finds_planted_dups(ray_session, planted_docs):
    from canal_ray.ops.dedup import minhash_dedup_keep, minhash_lsh_dup_pairs

    pairs = minhash_lsh_dup_pairs(planted_docs, jaccard_threshold=0.5)
    found = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    # 5 exact dup pairs (i, 40+i) and 5 near-dup pairs (i, 45+i-5)
    for i in range(5):
        assert (i, 40 + i) in found, f"exact dup {i} missed"
        assert pairs[(pairs.doc_a == i) & (pairs.doc_b == 40 + i)]["jaccard"].iloc[0] == 1.0
    for i in range(5, 10):
        assert (i, 45 + i - 5) in found, f"near dup {i} missed"
    keep = minhash_dedup_keep(planted_docs, jaccard_threshold=0.5)
    assert keep[keep.doc_id == 41]["dup_of"].iloc[0] == 1
    assert not keep[keep.doc_id == 12]["is_dup"].iloc[0]
    assert int(keep["is_dup"].sum()) == 10


def test_simhash_near_dups_close(ray_session, planted_docs):
    from canal_ray.ops.dedup import simhash_docs

    df = simhash_docs(planted_docs).set_index("doc_id")["simhash"]

    def hamming(a, b):
        return bin((int(a) & (2**64 - 1)) ^ (int(b) & (2**64 - 1))).count("1")

    for i in range(5):
        assert hamming(df[i], df[40 + i]) == 0  # exact dup -> same simhash
    near = [hamming(df[i], df[45 + i - 5]) for i in range(5, 10)]
    far = [hamming(df[0], df[j]) for j in range(20, 30)]
    assert max(near) < min(far), f"near {near} not separated from far {far}"


def test_lsh_ann_overlaps_bruteforce(ray_session):
    from canal_ray.ops.ann import ann_cosine_topk, ann_lsh_topk

    sf = "/root/testdata/sf0.01"
    exact = ann_cosine_topk(sf)
    approx = ann_lsh_topk(sf)
    recall = []
    for q in exact["query_id"].unique():
        e = set(exact[exact.query_id == q]["vec_id"])
        a = set(approx[approx.query_id == q]["vec_id"])
        recall.append(len(e & a) / len(e))
    assert np.mean(recall) > 0.2, f"LSH recall too low: {recall}"
    assert len(approx) <= len(exact)


def test_fingerprint_stability(ray_session, planted_docs):
    from canal_ray.ops.text import doc_fingerprints

    # sort_index: Ray Data's default preserve_order=False means to_pandas
    # block order can differ between runs; values must still be identical
    a = doc_fingerprints(planted_docs).set_index("doc_id")["fingerprint"].sort_index()
    b = doc_fingerprints(planted_docs).set_index("doc_id")["fingerprint"].sort_index()
    pd.testing.assert_series_equal(a, b)  # deterministic
    for i in range(5):
        assert a[i] == a[40 + i]  # exact dups share fingerprints


def test_lang_id_shape(ray_session):
    from canal_ray.ops.text import lang_id

    df = lang_id("/root/testdata/sf0.01")
    assert set(df.columns) == {"doc_id", "lang_pred", "lang_score"}
    assert len(df) == 500
    assert (df["lang_pred"] == "en").mean() > 0.8  # corpus is English-ish


def test_ngram_jaccard_finds_planted_dups(ray_session, planted_docs):
    from canal_ray.ops.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(planted_docs, n=5, jaccard_threshold=0.6)
    found = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    for i in range(5):
        assert (i, 40 + i) in found  # exact dups at char level too
    near_found = sum((i, 45 + i - 5) in found for i in range(5, 10))
    assert near_found >= 4  # char 5-gram jaccard of 3/60-token edits is high


def test_ivf_ann_recall(ray_session):
    from canal_ray.ops.ann import ann_cosine_topk, ann_ivf_topk

    sf = "/root/testdata/sf0.01"
    exact = ann_cosine_topk(sf)
    approx = ann_ivf_topk(sf, n_clusters=16, nprobe=6)
    recall = []
    for q in exact["query_id"].unique():
        e = set(exact[exact.query_id == q]["vec_id"])
        a = set(approx[approx.query_id == q]["vec_id"])
        recall.append(len(e & a) / len(e))
    import numpy as np

    assert np.mean(recall) > 0.4, f"IVF recall too low: {recall}"
    # determinism across runs
    approx2 = ann_ivf_topk(sf, n_clusters=16, nprobe=6)
    assert approx.sort_values(["query_id", "rank"]).reset_index(drop=True).equals(
        approx2.sort_values(["query_id", "rank"]).reset_index(drop=True)
    )


def test_ivf_indexed_equals_inline(ray_session, tmp_path):
    """The persisted-index IVF path must return exactly the in-line IVF
    result (same seeded centroids) — equivalence oracle for the index build
    + directory-pruned read."""
    from canal_ray.ops.ann import ann_ivf_indexed_topk, ann_ivf_topk

    sf = "/root/testdata/sf0.001"
    inline = ann_ivf_topk(sf, n_clusters=16, nprobe=4)
    indexed = ann_ivf_indexed_topk(
        sf, n_clusters=16, nprobe=4, index_root=str(tmp_path / "ivf")
    )
    a = inline.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = indexed.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # second call hits the completed index (resumable build marker)
    indexed2 = ann_ivf_indexed_topk(
        sf, n_clusters=16, nprobe=4, index_root=str(tmp_path / "ivf")
    )
    pd.testing.assert_frame_equal(
        b, indexed2.sort_values(["query_id", "rank"]).reset_index(drop=True)
    )


def test_ann_recall_report(ray_session):
    from canal_ray.ops.ann import ann_recall_report

    df = ann_recall_report("/root/testdata/sf0.01")
    means = df[df["query_id"] == -1].set_index("method")["recall"]
    # in-line IVF and the persisted index must agree exactly (same math)
    assert means["ivf"] == means["ivf_indexed"]
    # sanity floors on near-random embeddings (deterministic seeds)
    assert means["ivf"] >= 0.4
    assert means["lsh"] >= 0.2
    per_q = df[df["query_id"] >= 0]
    assert ((per_q["recall"] >= 0.0) & (per_q["recall"] <= 1.0)).all()


def test_approx_quantiles_track_exact(ray_session):
    """The histogram-sketch quantiles run their own distributed-merge oracle
    in-process; here additionally sanity-band them against the exact
    quantile_cont values (loose: sparse-tail gaps are the sketch's
    documented trade-off)."""
    from canal_ray.ops.relational import approx_quantiles_by_type, median_value_by_type

    sf = "/root/testdata/sf0.01"
    approx = approx_quantiles_by_type(sf).set_index("event_type")
    exact = median_value_by_type(sf).set_index("event_type")
    assert set(approx.index) == set(exact.index)
    for et in exact.index:
        assert abs(approx.loc[et, "median_approx"] - exact.loc[et, "median_value"]) \
            <= 0.05 * max(exact.loc[et, "median_value"], 1.0)
        assert abs(approx.loc[et, "p90_approx"] - exact.loc[et, "p90_value"]) \
            <= 0.05 * max(exact.loc[et, "p90_value"], 1.0)


def test_hll_distinct_tracks_exact(ray_session):
    """HLL runs its register-merge + 3-sigma oracles in-process; here
    additionally pin the small-range regime: with ~150 true distinct users
    and 4096 registers the linear-counting estimate must land within 5%."""
    from canal_ray.ops.relational import approx_distinct_users_by_type

    sf = "/root/testdata/sf0.01"
    approx = approx_distinct_users_by_type(sf).set_index("event_type")
    exact = (
        pd.read_parquet(f"{sf}/events.parquet", columns=["event_type", "user_id"])
        .groupby("event_type")["user_id"]
        .nunique()
    )
    for et in exact.index:
        assert abs(int(approx.loc[et, "n_users_approx"]) - int(exact[et])) \
            <= max(0.05 * exact[et], 2)


def test_mg_sketch_finds_planted_heavy_hitter(ray_session, tmp_path):
    """A corpus with one planted dominant bigram (share >> 1/k): the
    Misra-Gries sketch must rank it #1 and its self-reported undercount
    bound must hold vs the exact count."""
    from canal_ray.ops.text import top_bigrams_sketch

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)]
    rows = []
    for i in range(200):
        toks = rng.choice(vocab, size=50, replace=True).tolist()
        # plant "alpha beta" ~8 times per doc (~14% of all bigrams)
        for j in range(3, 50, 6):
            toks[j - 1], toks[j] = "alpha", "beta"
        rows.append({"doc_id": i, "text": " ".join(toks)})
    df = pd.DataFrame(rows)
    df["lang"] = "en"; df["source"] = "s"; df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet", index=False)

    out = top_bigrams_sketch(str(tmp_path))
    assert out["bigram"].iloc[0] == "alpha beta"
    exact = sum(
        1
        for t in df["text"]
        for a, b in zip(t.split(), t.split()[1:])
        if (a, b) == ("alpha", "beta")
    )
    assert 0 <= exact - int(out["n_approx"].iloc[0]) <= int(out["max_undercount"].iloc[0])


def test_kmeans_partitions_all_vectors(ray_session):
    """Distributed Lloyd runs its sequential-recompute assignment oracle
    in-process; here pin the partition property: every vector lands in
    exactly one of the k clusters."""
    from canal_ray.ops.ann import embedding_kmeans

    out = embedding_kmeans("/root/testdata/sf0.01")
    assert len(out) == 8
    assert int(out["n_members"].sum()) == 500
    assert (out["n_members"] > 0).all()


def test_lm_perplexity_discriminates(ray_session, tmp_path):
    """LM perplexity runs its count-exact + score oracles in-process; here
    pin the discriminative property the filter exists for: a document of
    in-distribution bigrams scores lower perplexity than one of unseen
    gibberish tokens."""
    from canal_ray.ops.text import lm_perplexity

    rng = np.random.default_rng(7)
    # DENSE vocab: 10 words -> every in-dist bigram trains to high counts,
    # so add-one smoothing can't drown the in/out-of-distribution gap
    vocab = [f"w{i}" for i in range(10)]
    rows = [
        {"doc_id": i, "text": " ".join(rng.choice(vocab, size=40).tolist())}
        for i in range(100)
    ]
    rows.append({"doc_id": 100, "text": " ".join(f"zz{i}x" for i in range(40))})
    df = pd.DataFrame(rows)
    df["lang"] = "en"; df["source"] = "s"; df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet", index=False)

    out = lm_perplexity(str(tmp_path)).set_index("doc_id")
    in_dist = out.loc[range(100), "ppl"].median()
    assert out.loc[100, "ppl"] > 2 * in_dist


def test_jaccard_hot_shingle_df_cap(ray_session, tmp_path):
    """The df cap bounds pair enumeration on a hot (boilerplate) shingle:
    30 docs sharing ONE shingle would emit 435 pairs uncapped; with
    max_df=10 the hot bucket is skipped entirely while pairs backed by
    cold shingles still surface."""
    from canal_ray.ops.dedup import ngram_jaccard_exact_pairs

    rows = [
        # 30 hot docs: the only shingle of each is "spam spam spam" (df=30)
        {"doc_id": i, "text": "spam spam spam spam"} for i in range(30)
    ]
    # one cold near-dup pair: both docs' shingles have df=2
    rows.append({"doc_id": 100, "text": "alpha beta gamma delta"})
    rows.append({"doc_id": 101, "text": "alpha beta gamma delta"})
    df = pd.DataFrame(rows)
    df["lang"] = "en"; df["source"] = "s"; df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet", index=False)

    capped = ngram_jaccard_exact_pairs(str(tmp_path), max_df=10)
    assert set(map(tuple, capped[["doc_a", "doc_b"]].to_numpy())) == {(100, 101)}
    assert capped["jaccard"].iloc[0] == 1.0

    uncapped = ngram_jaccard_exact_pairs(str(tmp_path), max_df=256)
    # 30*29/2 hot pairs + the cold pair
    assert len(uncapped) == 30 * 29 // 2 + 1


def test_bpe_token_counts(ray_session, tmp_path):
    """BPE-ish counting runs its exact sequential-recompute oracle
    in-process; here pin the contract on hand-checkable docs: contractions,
    punctuation runs and digit runs each count as their own piece."""
    from canal_ray.ops.text import bpe_token_counts

    rows = [
        # 'it | 's | 42 | ! | ! -> wait: " ?[^..]+" groups "!!" as ONE run
        {"doc_id": 0, "text": "it's 42!!"},   # it / 's / ' 42' / '!!' = 4
        {"doc_id": 1, "text": "hello world"},  # hello / ' world' = 2
        {"doc_id": 2, "text": ""},             # no pieces = 0
    ]
    df = pd.DataFrame(rows)
    df["lang"] = "en"; df["source"] = "s"; df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet", index=False)

    out = bpe_token_counts(str(tmp_path)).set_index("doc_id")
    assert out.loc[0, "n_bpe_tokens"] == 4
    assert out.loc[1, "n_bpe_tokens"] == 2
    assert out.loc[2, "n_bpe_tokens"] == 0
    assert out.loc[1, "n_ws_tokens"] == 2


def test_distributed_component_labeling_matches_union_find(ray_session, tmp_path):
    """The corpus-scale labeling path (iterative min-label propagation:
    join + groupby per round) must produce EXACTLY the driver union-find's
    labels — chain components exercise multi-round convergence (a path
    graph's min label needs diameter rounds to reach the far end),
    singletons exercise the left-outer corpus join."""
    import pandas as pd

    from canal_ray.ops.dedup import (
        _label_components,
        _label_components_distributed,
    )

    docs = pd.DataFrame({"doc_id": list(range(12))})
    docs["text"] = "x"
    docs["lang"] = "en"; docs["source"] = "s"; docs["n_chars"] = 1
    docs.to_parquet(tmp_path / "documents.parquet", index=False)

    # chain 0-1-2-3-4 (diameter 4 > 1 round), pair 7-9, singletons 5,6,8,10,11
    pairs = pd.DataFrame(
        {"doc_a": [0, 1, 2, 3, 7], "doc_b": [1, 2, 3, 4, 9]}
    )

    dist = _label_components_distributed(str(tmp_path), pairs)
    want = _label_components(str(tmp_path), pairs)
    pd.testing.assert_frame_equal(
        dist.reset_index(drop=True), want.reset_index(drop=True)
    )
    assert list(dist.loc[dist["doc_id"] <= 4, "dup_of"]) == [0] * 5
    assert dist.loc[dist["doc_id"] == 9, "dup_of"].item() == 7
    assert not dist.loc[dist["doc_id"].isin([5, 6, 8, 10, 11]), "is_dup"].any()


def test_cc_driver_cap_switches_to_distributed(ray_session, tmp_path, monkeypatch):
    """CANAL_CC_DRIVER_MAX=0 forces every edge set down the distributed
    path through the public dedup-keep entry point."""
    import pandas as pd

    from canal_ray.ops.dedup import jaccard_dedup_keep

    rows = [
        {"doc_id": 0, "text": "alpha beta gamma delta"},
        {"doc_id": 1, "text": "alpha beta gamma delta"},
        {"doc_id": 2, "text": "something else entirely here"},
    ]
    df = pd.DataFrame(rows)
    df["lang"] = "en"; df["source"] = "s"; df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet", index=False)

    monkeypatch.setenv("CANAL_CC_DRIVER_MAX", "0")
    out = jaccard_dedup_keep(str(tmp_path)).set_index("doc_id")
    assert out.loc[1, "dup_of"] == 0 and bool(out.loc[1, "is_dup"])
    assert out.loc[0, "dup_of"] == 0 and not bool(out.loc[0, "is_dup"])
    assert out.loc[2, "dup_of"] == 2 and not bool(out.loc[2, "is_dup"])


def test_distributed_cc_random_graph(ray_session, tmp_path):
    """Fixed-seed random graph (denser, multiple merged components) —
    distributed propagation must agree with union-find exactly."""
    import numpy as np
    import pandas as pd

    from canal_ray.ops.dedup import (
        _label_components,
        _label_components_distributed,
    )

    n = 25
    docs = pd.DataFrame({"doc_id": list(range(n))})
    docs["text"] = "x"
    docs["lang"] = "en"; docs["source"] = "s"; docs["n_chars"] = 1
    docs.to_parquet(tmp_path / "documents.parquet", index=False)

    rng = np.random.default_rng(777)
    a = rng.integers(0, n, size=40)
    b = rng.integers(0, n, size=40)
    keep = a != b
    pairs = pd.DataFrame(
        {"doc_a": np.minimum(a[keep], b[keep]), "doc_b": np.maximum(a[keep], b[keep])}
    ).drop_duplicates()

    dist = _label_components_distributed(str(tmp_path), pairs)
    want = _label_components(str(tmp_path), pairs)
    pd.testing.assert_frame_equal(
        dist.reset_index(drop=True), want.reset_index(drop=True)
    )


def test_bm25_topk_ranking(ray_session, tmp_path):
    """Hand-checkable BM25 contract: higher tf ranks higher at equal length;
    a rarer term outweighs a common one; docs without any query term are
    absent. The op also asserts its exact sequential-recompute oracle
    in-process on every call."""
    import pandas as pd

    from canal_ray.ops.text import bm25_topk

    rows = [
        {"doc_id": 0, "text": "apple apple apple pad pad pad pad"},  # tf=3
        {"doc_id": 1, "text": "apple pad pad pad pad pad pad"},      # tf=1
        {"doc_id": 2, "text": "banana pad pad pad pad pad pad"},     # rare term
        {"doc_id": 3, "text": "pad pad pad pad pad pad pad"},        # no match
    ]
    # make 'apple' common (lower idf) and keep 'banana' rare (df=1)
    for i in range(4, 14):
        rows.append({"doc_id": i, "text": "apple filler filler filler filler filler filler"})
    df = pd.DataFrame(rows)
    df["lang"] = "en"; df["source"] = "s"; df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet", index=False)

    out = bm25_topk(str(tmp_path), query="apple banana", k=14)
    assert 3 not in set(out["doc_id"])                      # no-match excluded
    r = out.set_index("doc_id")["rank"]
    assert r[2] < r[0] < r[1]   # rare banana > tf-3 apple > tf-1 apple


def test_dedup_labels_to_parquet_matches_dataframe(ray_session, tmp_path):
    """The lake-write variant (hash-bucketed partitioned parquet) carries
    exactly the rows of the DataFrame contract — same count, same digest —
    plus the bucket partition column it was laid out by."""
    import numpy as np
    import pandas as pd

    from canal_ray.ops.dedup import dedup_labels_to_parquet, jaccard_dedup_keep

    rows = [
        {"doc_id": 0, "text": "alpha beta gamma delta epsilon"},
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon"},
        {"doc_id": 2, "text": "alpha beta gamma delta zeta"},
        {"doc_id": 3, "text": "something else entirely here now"},
        {"doc_id": 67, "text": "unique text for a high doc id"},
    ]
    df = pd.DataFrame(rows)
    df["lang"] = "en"; df["source"] = "s"; df["n_chars"] = df["text"].str.len()
    sf = tmp_path / "sf"; sf.mkdir()
    df.to_parquet(sf / "documents.parquet", index=False)

    want = jaccard_dedup_keep(str(sf))
    out_dir = str(tmp_path / "labels")
    dedup_labels_to_parquet(str(sf), out_dir, method="jaccard", n_buckets=4)

    got = pd.read_parquet(out_dir)
    assert set(got.columns) == {"doc_id", "dup_of", "is_dup", "bucket"}
    # hive partitioning must place every row in its doc_id % 4 bucket
    assert (got["bucket"].astype(np.int64) == got["doc_id"] % 4).all()
    got = (
        got[["doc_id", "dup_of", "is_dup"]]
        .astype({"doc_id": "int64", "dup_of": "int64", "is_dup": "bool"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_dup_span_token_stats_planted(ray_session, tmp_path):
    """Substring-level dedup: a k-token boilerplate span repeated across
    otherwise-unique docs is flagged token-exactly; unique docs score 0.
    The op also asserts its sequential dict recompute in-process."""
    from canal_ray.ops.dedup import dup_span_token_stats

    boiler = "the quick brown fox jumps over the lazy dog"  # 9 tokens
    rows = [
        {"doc_id": 0, "text": boiler + " alpha beta gamma delta"},
        {"doc_id": 1, "text": "one two three " + boiler},
        {"doc_id": 2, "text": "entirely unique words here nothing repeats at all today"},
        {"doc_id": 3, "text": "short doc"},  # fewer than k tokens
    ]
    df = pd.DataFrame(rows)
    df["lang"] = "en"; df["source"] = "s"; df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet", index=False)

    out = dup_span_token_stats(str(tmp_path), k=9).set_index("doc_id")
    # the 9-token boilerplate is the only duplicated window
    assert int(out.loc[0, "n_dup_tokens"]) == 9
    assert int(out.loc[1, "n_dup_tokens"]) == 9
    assert int(out.loc[2, "n_dup_tokens"]) == 0
    assert int(out.loc[3, "n_dup_tokens"]) == 0 and int(out.loc[3, "n_tokens"]) == 2
    assert abs(out.loc[1, "dup_ratio"] - 9 / 12) < 1e-9


def test_dup_span_overlapping_windows_union(ray_session, tmp_path):
    """Overlapping duplicated windows must be UNION-counted, not summed:
    two docs sharing a 10-token run with k=8 have 3 duplicated windows but
    exactly 10 duplicated tokens each."""
    from canal_ray.ops.dedup import dup_span_token_stats

    run = " ".join(f"w{i}" for i in range(10))
    rows = [
        {"doc_id": 0, "text": run + " tail0 only0"},
        {"doc_id": 1, "text": "head1 just1 " + run},
    ]
    df = pd.DataFrame(rows)
    df["lang"] = "en"; df["source"] = "s"; df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet", index=False)

    out = dup_span_token_stats(str(tmp_path), k=8).set_index("doc_id")
    assert int(out.loc[0, "n_dup_tokens"]) == 10
    assert int(out.loc[1, "n_dup_tokens"]) == 10


def test_repetition_stats_planted(ray_session, tmp_path):
    """Gopher repetition signals: a degenerate looping doc scores high
    duplicate-ngram fractions; diverse text scores 0. The op asserts its
    Counter recompute in-process."""
    from canal_ray.ops.text import repetition_stats

    rows = [
        {"doc_id": 0, "text": "spam ham " * 20},                  # pure loop
        {"doc_id": 1, "text": "all tokens completely different here today"},
        {"doc_id": 2, "text": ""},
    ]
    df = pd.DataFrame(rows)
    df["lang"] = "en"; df["source"] = "s"; df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet", index=False)

    out = repetition_stats(str(tmp_path)).set_index("doc_id")
    # 40 tokens alternating spam/ham: 39 bigrams, 2 unique -> 37/39 dup
    assert abs(out.loc[0, "dup_2gram_frac"] - round(1 - 2 / 39, 6)) < 1e-9
    assert out.loc[0, "top_token_frac"] == 0.5
    assert out.loc[1, "dup_2gram_frac"] == 0.0
    assert out.loc[1, "dup_3gram_frac"] == 0.0
    assert out.loc[2, "top_token_frac"] == 0.0


def test_dedup_labels_to_parquet_minhash_method(ray_session, tmp_path):
    """The lake-write path's minhash variant carries exactly the rows of
    minhash_dedup_keep's DataFrame contract."""
    import pandas as pd

    from canal_ray.ops.dedup import dedup_labels_to_parquet, minhash_dedup_keep

    rows = [
        {"doc_id": 0, "text": "alpha beta gamma delta epsilon zeta eta theta"},
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta eta theta"},
        {"doc_id": 2, "text": "totally different content in this document here"},
        {"doc_id": 3, "text": "another unique piece of text entirely"},
    ]
    df = pd.DataFrame(rows)
    df["lang"] = "en"; df["source"] = "s"; df["n_chars"] = df["text"].str.len()
    sf = tmp_path / "sf"; sf.mkdir()
    df.to_parquet(sf / "documents.parquet", index=False)

    want = minhash_dedup_keep(str(sf))
    out_dir = str(tmp_path / "labels_mh")
    dedup_labels_to_parquet(str(sf), out_dir, method="minhash", n_buckets=2)
    got = (
        pd.read_parquet(out_dir)[["doc_id", "dup_of", "is_dup"]]
        .astype({"doc_id": "int64", "dup_of": "int64", "is_dup": "bool"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert bool(got.set_index("doc_id").loc[1, "is_dup"])
