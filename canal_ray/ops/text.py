"""Text analysis ops over the ``documents`` table (training-data pipeline).

Language-ID, quality scoring, token counting and document fingerprinting as
vectorized Ray Data stages. Stateful pieces (compiled regexes, stopword
tables, language profiles) live in callable-class actor pools — built once
per actor in ``__init__``, applied per batch in ``__call__`` (the actor-pool
contract of SURVEY.md §2.4: Canal's analog is per-connection caches like
``parse/.../dbsync/TableMetaCache.java``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd
from ray.data.aggregate import Sum

from canal_ray.ops.util import parquet_num_rows, self_oracle_enabled

# shared with the SQL oracle — keep lists identical
STOPWORDS = ("a", "the", "key", "row", "value", "table")


class TokenStats:
    """Actor-pool stage: token statistics per document (vectorized pandas)."""

    def __init__(self):
        self.stop = frozenset(STOPWORDS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # empty/whitespace-only docs tokenize to [''] exactly like the DuckDB
        # oracle's regexp_split_to_array(trim(text), '\s+') — n_tokens=1,
        # ratios 0.0 (a bare [] would divide by zero into NaN and break
        # parity); simhash/fingerprints defend the same case. NULL text
        # splits to NaN (truthy!), hence the isinstance check, not `if ws`
        toks = batch["text"].str.strip().str.split().map(lambda ws: ws if (isinstance(ws, list) and ws) else [""])
        n_tokens = toks.str.len().astype("int64")
        tok_chars = toks.map(lambda ws: sum(len(w) for w in ws))
        n_stop = toks.map(lambda ws: sum(w in self.stop for w in ws))
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_chars": batch["text"].str.len().fillna(0).astype("int64"),
                "n_tokens": n_tokens,
                "mean_token_len": tok_chars / n_tokens,
                "stopword_ratio": n_stop / n_tokens,
            }
        )


def token_stats(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        TokenStats, batch_format="pandas", concurrency=2, max_restarts=0
    ).to_pandas()


# GPT-2-style pre-tokenizer pattern (public: openai/gpt-2 encoder.py), RE2-
# compatible subset — contractions, letter runs, digit runs, punctuation
# runs (each optionally space-prefixed), then whitespace runs. The lookahead
# `\s+(?!\S)` of the original is dropped (RE2/DuckDB have no lookahead);
# whitespace-run counting is the documented contract here. Counting against
# this pattern approximates BPE token counts ~2x better than whitespace
# splitting (BPE merges happen WITHIN these pieces, never across).
BPE_SPLIT_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
)


class BpeTokenCounts:
    """Actor-pool stage: BPE-ish token counts per document.

    The pattern compiles ONCE per actor in ``__init__`` (the real tokenizer
    swap-in point: load a merges/vocab file here at production scale);
    ``__call__`` counts with the vectorized pandas ``str.count`` kernel."""

    def __init__(self):
        import re

        self.pat = re.compile(BPE_SPLIT_PATTERN)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_bpe = batch["text"].str.count(self.pat).astype("int64")
        ws = batch["text"].str.strip().str.split()
        n_ws = ws.map(lambda w: len(w) if w else 1).astype("int64")
        n_chars = batch["text"].str.len().astype("int64")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": n_bpe,
                "n_ws_tokens": n_ws,
                # chars-per-BPE-token: the standard quality/cost signal
                # (low => symbol soup, high => long-word prose)
                "chars_per_token": np.where(n_bpe > 0, n_chars / np.maximum(n_bpe, 1), 0.0),
            }
        )


def bpe_token_counts(sf_dir: str) -> pd.DataFrame:
    """Token counting against a BPE-ish pre-tokenizer regex (the other half
    of the prompt's token-counting pair next to whitespace ``token_stats``).

    In-process oracle: a sequential ``re.findall`` recompute over the corpus
    must match every count exactly (fixture-scale only; the distributed path
    is the contract)."""
    import re

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = (
        ds.map_batches(
            BpeTokenCounts, batch_format="pandas", concurrency=2, max_restarts=0
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    if self_oracle_enabled(len(out), "bpe_token_counts"):
        seq = pd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id").reset_index(drop=True)
        pat = re.compile(BPE_SPLIT_PATTERN)
        want = np.array([len(pat.findall(t)) for t in seq["text"]], dtype=np.int64)
        if not np.array_equal(out["n_bpe_tokens"].to_numpy(), want):
            raise AssertionError("distributed BPE token counts diverged from sequential")
    return out


def quality_flags(sf_dir: str) -> pd.DataFrame:
    """Boolean quality gates (C4/Gopher-style heuristics, public recipes):
    length bounds, token-length sanity, stopword presence."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    class Flags(TokenStats):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            s = super().__call__(batch)
            return pd.DataFrame(
                {
                    "doc_id": s["doc_id"],
                    "len_ok": (s["n_tokens"] >= 10) & (s["n_tokens"] <= 10_000),
                    "token_len_ok": (s["mean_token_len"] >= 2.0) & (s["mean_token_len"] <= 12.0),
                    "has_stopwords": s["stopword_ratio"] > 0.0,
                }
            )

    return ds.map_batches(
        Flags, batch_format="pandas", concurrency=2, max_restarts=0
    ).to_pandas()


# deterministic per-language stopword profiles (public-knowledge heuristic;
# the corpus vocabulary is English-ish so 'en' should dominate)
_LANG_PROFILES = {
    "en": {"the", "a", "of", "to", "and", "in", "value", "table", "row", "key"},
    "de": {"der", "die", "das", "und", "ist", "ein", "nicht", "mit"},
    "fr": {"le", "la", "les", "et", "un", "une", "est", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "para"},
}


class LangId:
    """Actor-pool language-ID: stopword-profile hit-rate argmax."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.split()
        scores = {
            lang: toks.map(lambda ws, p=prof: sum(w in p for w in ws) / max(1, len(ws)))
            for lang, prof in self.profiles.items()
        }
        sc = pd.DataFrame(scores)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": sc.idxmax(axis=1),
                "lang_score": sc.max(axis=1),
            }
        )


def lang_id(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        LangId, batch_format="pandas", concurrency=2, max_restarts=0
    ).to_pandas()


def _tok_hashes(toks: list[str], hash_fn: str) -> np.ndarray:
    """Per-token 64-bit hashes.

    ``md5`` (default): first 16 hex chars of md5 — byte-identical to DuckDB's
    ``('0x' || substr(md5(x), 1, 16))::UBIGINT``, which makes the op
    oracle-checkable end to end. ``fast``: one vectorized siphash pass (the
    100 TB path when oracle-exact digests are not required).
    """
    if not toks:
        return np.array([], dtype=np.uint64)
    if hash_fn == "fast":
        return pd.util.hash_array(np.array(toks, dtype=object)).astype(np.uint64)
    import hashlib

    return np.array(
        [int(hashlib.md5(t.encode()).hexdigest()[:16], 16) for t in toks],
        dtype=np.uint64,
    )


class Fingerprinter:
    """Rolling-hash (Rabin-Karp) winnowing fingerprint per document.

    Deterministic 63-bit fingerprint = min over windowed rolling hashes of the
    token-hash sequence (winnowing, Schleimer et al. 2003 — public algorithm).
    """

    B = np.uint64(1_000_003)
    MASK = np.uint64((1 << 63) - 1)

    def __init__(self, window: int = 4, hash_fn: str = "md5"):
        self.window = window
        self.hash_fn = hash_fn

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        w = self.window
        fps = np.zeros(len(batch), dtype=np.int64)
        for i, text in enumerate(batch["text"].tolist()):
            h = _tok_hashes(text.split(), self.hash_fn)
            if len(h) < w:
                roll = h if len(h) else np.array([np.uint64(0)])
            else:
                # vectorized rolling hash over windows of w token hashes;
                # uint64 wraparound is harmless: (x mod 2^64) mod 2^63 ==
                # x mod 2^63, which is what the SQL oracle computes exactly
                acc = np.zeros(len(h) - w + 1, dtype=np.uint64)
                with np.errstate(over="ignore"):
                    for j in range(w):
                        acc = (acc * self.B + h[j : len(h) - w + 1 + j]) & self.MASK
                roll = acc
            fps[i] = int(roll.min() & self.MASK)
        return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": fps})


def doc_fingerprints(sf_dir: str, hash_fn: str = "md5") -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        Fingerprinter, fn_constructor_args=(4, hash_fn),
        batch_format="pandas", concurrency=2, max_restarts=0,
    ).to_pandas()


def _batch_bigram_counts(t):
    """Vectorized in-batch bigram value_counts — the kernel SHARED by the
    exact (``top_bigrams``) and sketch (``top_bigrams_sketch``) variants:
    flatten the token list-array once, adjacent pairs via offset
    arithmetic, each doc's LAST token masked so no cross-doc bigram forms.
    Returns None when the batch yields no bigrams."""
    import pyarrow as pa
    import pyarrow.compute as pc

    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(t["text"].combine_chunks()), r"\s+"
    )
    off = toks.offsets.to_numpy()
    vals = toks.values
    valid = np.ones(len(vals), dtype=bool)
    ends = off[1:]
    nz = ends[ends > 0] - 1  # each doc's last token: no successor
    valid[nz] = False
    left_idx = np.flatnonzero(valid)
    if left_idx.size == 0:
        return None
    left = vals.take(pa.array(left_idx))
    right = vals.take(pa.array(left_idx + 1))
    return pc.binary_join_element_wise(left, right, " ").value_counts()


def top_bigrams(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Corpus-wide top-k word bigrams — the n-gram statistics pass of a
    training-data pipeline (e.g. contamination screens / boilerplate
    detection over public recipes).

    Scale shape: per-batch bigram counting entirely in Arrow/numpy
    (``_batch_bigram_counts``), partial counts as a combiner, ONE
    groupby(bigram) over partial counts, then a distributed sort + limit k.
    Nothing corpus-sized touches the driver."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        counts = _batch_bigram_counts(t)
        if counts is None:
            return pa.table(
                {"bigram": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {
                "bigram": counts.field("values"),
                "n": pc.cast(counts.field("counts"), pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(rd.aggregate.Sum("n", alias_name="n"))
        .sort(["n", "bigram"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return out[["bigram", "n"]]


def source_cap(sf_dir: str, n: int = 50) -> pd.DataFrame:
    """Deterministic per-(lang, source) downsampling cap — the "don't let
    one crawl dominate the mix" curation step of a training-data pipeline.
    Keeps the n lowest-doc_id docs per cell (a stable, seedless rule both
    sides can compute exactly).

    Scale shape: per-batch partial cap first (each batch keeps at most n
    per cell — pandas C-path sort + groupby.head), so the ONE exchange
    moves <= n rows per cell per block, never the full corpus; the final
    per-cell cap runs on groups bounded by n x blocks."""
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"]
    )

    def cap(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.sort_values("doc_id")
            .groupby(["lang", "source"], sort=False)
            .head(n)
        )

    return (
        ds.map_batches(cap, batch_format="pandas")
        .groupby(["lang", "source"])
        .map_groups(cap, batch_format="pandas")
        .to_pandas()[["doc_id", "lang", "source"]]
    )


# benchmark-phrase screen list (synthetic stand-ins; the real pipeline
# broadcasts the eval-set shingle table the same way)
CONTAMINATION_PATTERNS = (
    "merge sort line",
    "query filter batch",
    "stream window agg",
)


def contamination_screen(sf_dir: str) -> pd.DataFrame:
    """Decontamination pass: flag documents containing any screened phrase
    (eval-set leakage screen, standard practice in public LLM data recipes).
    The pattern set is tiny and rides in the task closure (broadcast-once);
    matching is one vectorized regex alternation per batch — compiled once
    per worker by pandas' regex cache, no per-row Python."""
    import re

    pat = "|".join(re.escape(p) for p in CONTAMINATION_PATTERNS)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def screen(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "contaminated": b["text"].str.contains(pat, regex=True),
            }
        )

    return ds.map_batches(screen, batch_format="pandas").to_pandas()


# per-language keep rates (percent) for the stratified sampler: cap the
# dominant language, keep the tails dense — the standard "rebalance the
# language mix" curation step. Literal shared with the SQL oracle.
SAMPLE_RATE_PCT = {"en": 30}
SAMPLE_RATE_DEFAULT_PCT = 80
SAMPLE_SALT = "v1|"


def hash_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic stratified document sampling: keep a doc iff
    ``md5(salt + doc_id) % 100 < rate(lang)`` — seeded by the salt, stable
    across runs/engines (no RNG state to coordinate), embarrassingly
    parallel (pure per-row filter, NO exchange at all). The md5 keeps the
    op byte-identical to the DuckDB oracle; the scale default would swap in
    a vectorized 64-bit mixer exactly like doc_fingerprints/_fast_hash."""
    import hashlib

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])

    def sample(b: pd.DataFrame) -> pd.DataFrame:
        buckets = np.fromiter(
            (
                int(hashlib.md5(f"{SAMPLE_SALT}{d}".encode()).hexdigest()[:16], 16) % 100
                for d in b["doc_id"]
            ),
            dtype=np.int64,
            count=len(b),
        )
        rates = (
            b["lang"]
            .map(SAMPLE_RATE_PCT)
            .fillna(SAMPLE_RATE_DEFAULT_PCT)
            .to_numpy(dtype=np.int64)
        )
        return b[buckets < rates][["doc_id", "lang"]]

    return ds.map_batches(sample, batch_format="pandas").to_pandas()


# deny-list scrub (the PII-redaction machinery: vectorized regexp_replace +
# match counting; this corpus has no digits/emails, so the deny-list stands
# in for the PII pattern table — the op is the same code path)
SCRUB_PATTERN = r"\b(key|table|row)\b"
SCRUB_MASK = "<MASK>"


def token_scrub(sf_dir: str) -> pd.DataFrame:
    """Redaction pass: mask every deny-listed token, count redactions, and
    fingerprint the scrubbed text (md5) so the full output stays narrow.
    One vectorized regex replace + one count per batch — the exact shape of
    a PII scrub over 100 TB (pattern broadcast in the closure, no exchange)."""
    import hashlib

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def scrub(b: pd.DataFrame) -> pd.DataFrame:
        n = b["text"].str.count(SCRUB_PATTERN).astype("int64")
        red = b["text"].str.replace(SCRUB_PATTERN, SCRUB_MASK, regex=True)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_redactions": n,
                "scrubbed_md5": red.map(lambda t: hashlib.md5(t.encode()).hexdigest()),
            }
        )

    return ds.map_batches(scrub, batch_format="pandas").to_pandas()


# context-window capacity (tokens) for sequence packing
PACK_CAP = 256
_PACK_SHARDS = 32


def seq_pack(sf_dir: str) -> pd.DataFrame:
    """Concat-and-chunk sequence packing (the standard LLM pretraining
    step): documents concatenated in doc_id order and split into
    ``PACK_CAP``-token context windows; each doc reports its window id and
    intra-window offset.

    The global token prefix-sum is computed distributed, two-stage:
      1. slim per-doc (doc_id, n_tokens) table (map_batches, token rule
         identical to token_stats);
      2. per-range-shard token totals -> tiny driver-side cumsum over
         ``_PACK_SHARDS`` rows -> broadcast base offsets;
      3. within-shard ordered cumsum + base (groupby(shard).map_groups).
    Only the slim 16-byte/doc intermediate is materialized (bounded; at
    10^10 docs it would instead persist as a parquet side table), and the
    driver ever sees ``_PACK_SHARDS`` partial sums, never rows."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tok_counts(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.strip().str.split().map(lambda ws: ws if (isinstance(ws, list) and ws) else [""])
        return pd.DataFrame(
            {"doc_id": b["doc_id"], "n_tokens": toks.str.len().astype("int64")}
        )

    slim = ds.map_batches(tok_counts, batch_format="pandas").materialize()
    lo = slim.min("doc_id")
    hi = slim.max("doc_id")
    span = max(1, (hi - lo + _PACK_SHARDS) // _PACK_SHARDS)

    def with_range_shard(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(_shard=((b["doc_id"] - lo) // span).astype("int64"))

    sharded = slim.map_batches(with_range_shard, batch_format="pandas")
    totals = (
        sharded.groupby("_shard")
        .aggregate(Sum("n_tokens", alias_name="total"))
        .to_pandas()
        .sort_values("_shard")
    )
    bases = dict(
        zip(totals["_shard"], totals["total"].cumsum() - totals["total"])
    )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        off = int(bases[g["_shard"].iloc[0]]) + (
            g["n_tokens"].cumsum() - g["n_tokens"]
        )
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "n_tokens": g["n_tokens"],
                "seq_id": (off // PACK_CAP).astype("int64"),
                "offset_in_seq": (off % PACK_CAP).astype("int64"),
            }
        )

    return (
        sharded.groupby("_shard")
        .map_groups(pack, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def top_bigrams_sketch(sf_dir: str, k_counters: int = 64, k_out: int = 10) -> pd.DataFrame:
    """Heavy-hitters sketch for corpus n-grams — the bounded-exchange
    variant of ``top_bigrams`` (whose one groupby moves a row per DISTINCT
    bigram; at web scale the distinct-bigram universe dwarfs the heavy
    tail). Completes the mergeable-sketch family next to the quantile
    histogram and HLL.

    Per batch: exact in-batch counts (same vectorized Arrow kernel as
    top_bigrams), then Misra-Gries compression to ``k_counters`` survivors
    (subtract the (k+1)-th count, keep positives) — each batch forwards at
    most ``k_counters`` rows regardless of vocabulary. Summing compressed
    partials (ONE small groupby) undercounts any bigram by at most
    N / k_counters total (each batch forgives <= n_batch/k of every key),
    so every bigram with true share > 1/k_counters is guaranteed to
    survive. In-process oracle: the exact top-5 (from the SQL-oracled
    ``top_bigrams``) is a subset of the sketch's top-``k_out``, and every
    reported count is within N/k_counters below its exact count."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        counts = _batch_bigram_counts(t)
        if counts is None:
            return pa.table(
                {"bigram": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64()),
                 "forgiven": pa.array([], type=pa.int64())}
            )
        n = pc.cast(counts.field("counts"), pa.int64()).to_numpy()
        # Misra-Gries compression: subtract the (k+1)-th largest count.
        # One SENTINEL row per batch ("\x00forgiven") carries the cut, so
        # the same groupby that merges counts also sums the total global
        # forgiveness — the self-reported error bound of the final answer.
        if len(n) > k_counters:
            cut = int(np.partition(n, -k_counters - 1)[-k_counters - 1])
            keep = n > cut
            bigrams = counts.field("values").filter(pa.array(keep))
            kept = n[keep] - cut
            return pa.table(
                {
                    "bigram": pa.concat_arrays(
                        [bigrams.combine_chunks() if isinstance(bigrams, pa.ChunkedArray) else bigrams,
                         pa.array(["\x00forgiven"])]
                    ),
                    "n": pa.array(np.concatenate([kept, [0]])),
                    "forgiven": pa.array(
                        np.concatenate([np.zeros(len(kept), dtype=np.int64), [cut]])
                    ),
                }
            )
        return pa.table(
            {
                "bigram": counts.field("values"),
                "n": pa.array(n),
                "forgiven": pa.array(np.zeros(len(n), dtype=np.int64)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(
            rd.aggregate.Sum("n", alias_name="n_approx"),
            rd.aggregate.Sum("forgiven", alias_name="forgiven"),
        )
        .to_pandas()
    )
    sentinel = agg["bigram"] == "\x00forgiven"
    total_forgiven = int(agg.loc[sentinel, "forgiven"].sum())
    agg = agg[~sentinel]
    out = (
        agg.sort_values(["n_approx", "bigram"], ascending=[False, True])
        .head(k_out)[["bigram", "n_approx"]]
        .astype({"n_approx": "int64"})
        .reset_index(drop=True)
    )
    out["max_undercount"] = total_forgiven  # self-reported error bound

    # in-process oracle — assert exactly what Misra-Gries PROMISES, no more:
    # (a) any bigram whose true count exceeds the total forgiveness must
    #     survive into the merged sketch (this corpus's bigrams are nearly
    #     flat, so at small scale few/no bigrams clear the bar — the assert
    #     is then vacuous but the BOUND is still computed and reported);
    # (b) every candidate's n_approx sits in [exact - total_forgiven, exact]
    #     (sequential exact recount of just the candidates; test oracle only)
    if self_oracle_enabled(
        parquet_num_rows(f"{sf_dir}/documents.parquet"), "top_bigrams_sketch"
    ):
        exact = top_bigrams(sf_dir, k=5)
        ex_top = dict(zip(exact["bigram"], exact["n"]))
        lost_guaranteed = {
            b for b, n in ex_top.items() if n > total_forgiven
        } - set(agg["bigram"])
        if lost_guaranteed:
            raise AssertionError(f"sketch lost guaranteed heavy hitters: {lost_guaranteed}")

        cand = set(out["bigram"])
        texts = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])["text"]
        ex_cand: dict[str, int] = {b: 0 for b in cand}
        for t in texts:
            ws = t.strip().split()
            for a, b in zip(ws, ws[1:]):
                bg = f"{a} {b}"
                if bg in ex_cand:
                    ex_cand[bg] += 1
        for _, r in out.iterrows():
            err = ex_cand[r["bigram"]] - r["n_approx"]
            if err < 0 or err > total_forgiven:
                raise AssertionError("sketch count outside Misra-Gries bound")
    return out


def term_doc_frequency(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Corpus term statistics — the document-frequency side of TF-IDF/BM25
    (the IR weighting every retrieval-based curation step needs): for the
    top-``k`` terms by document frequency, (term, df, total_tf). All-integer
    arithmetic, so the SQL oracle matches exactly.

    Scale shape: per-batch (term, n_docs, n_occurrences) partials from one
    tokenization pass (docs deduped per term within the batch — the
    combiner; exact because a document never spans batches), ONE
    groupby(term) over partials, distributed sort + limit. The vocabulary
    never assembles on the driver."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.strip().str.split().map(lambda ws: ws if (isinstance(ws, list) and ws) else [""])
        flat = pd.DataFrame(
            {
                "doc_id": np.repeat(b["doc_id"].to_numpy(), toks.str.len()),
                "term": np.concatenate(toks.to_numpy()),
            }
        )
        tf = flat.groupby("term", as_index=False).size().rename(columns={"size": "total_tf"})
        df_ = (
            flat.drop_duplicates()
            .groupby("term", as_index=False)
            .size()
            .rename(columns={"size": "df"})
        )
        return tf.merge(df_, on="term").astype({"total_tf": "int64", "df": "int64"})

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("term")
        .aggregate(Sum("total_tf", alias_name="total_tf"), Sum("df", alias_name="df"))
        .sort(["df", "term"], descending=[True, False])  # distributed
        .limit(k)
        .to_pandas()
        .astype({"total_tf": "int64", "df": "int64"})
        .reset_index(drop=True)
    )
    return out[["term", "df", "total_tf"]]


def lm_perplexity(sf_dir: str) -> pd.DataFrame:
    """N-gram language-model quality scoring — the "perplexity filter" of
    public LLM data recipes (CCNet-style: score each document under a small
    LM trained on the corpus, filter the tails). Two distributed passes:

      1. TRAIN: unigram + bigram counts via the shared Arrow kernel
         (per-batch value_counts partials, one small groupby) — the model
         here is the full count table (this corpus' vocabulary is tiny); at
         web scale the standard move is pruning to the top-K n-grams before
         broadcast, which changes bytes, not shape.
      2. SCORE: model broadcast once (ray.put / cached_get), each batch
         computes every doc's mean log2 P(w_i | w_{i-1}) with add-one
         smoothing, fully vectorized (token-hash -> dict lookups via pandas
         map; one pass per batch).

    In-process oracle: the distributed model COUNTS equal a sequential
    recompute exactly (integer merge — what a broken exchange corrupts),
    and every doc's score matches a sequential per-doc evaluation to 1e-9
    (the vectorized segment-sum associates floats differently across batch
    boundaries — ulp noise, bounded and checked). Returns
    (doc_id, n_tokens, avg_logp, ppl)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from canal_ray.ops.util import cached_get

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    # ---- pass 1: counts ---------------------------------------------------
    def count_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t["text"].combine_chunks()), r"\s+"
        )
        uni = toks.values.value_counts()
        out = {
            "gram": uni.field("values"),
            "n": pc.cast(uni.field("counts"), pa.int64()),
            "order": pa.array(np.ones(len(uni), dtype=np.int64)),
        }
        big = _batch_bigram_counts(t)
        if big is not None:
            out = {
                "gram": pa.concat_arrays(
                    [out["gram"].combine_chunks() if isinstance(out["gram"], pa.ChunkedArray) else out["gram"],
                     big.field("values").combine_chunks() if isinstance(big.field("values"), pa.ChunkedArray) else big.field("values")]
                ),
                "n": pa.concat_arrays(
                    [out["n"].combine_chunks() if isinstance(out["n"], pa.ChunkedArray) else out["n"],
                     pc.cast(big.field("counts"), pa.int64()).combine_chunks()
                     if isinstance(big.field("counts"), pa.ChunkedArray)
                     else pc.cast(big.field("counts"), pa.int64())]
                ),
                "order": pa.array(
                    np.concatenate(
                        [np.ones(len(uni), dtype=np.int64),
                         np.full(len(big.field("values")), 2, dtype=np.int64)]
                    )
                ),
            }
        return pa.table(out)

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .to_pandas()  # partials are per-batch-distinct grams; bounded by
        # blocks x vocab here — the scale path prunes to top-K first
        .groupby(["order", "gram"], as_index=False)["n"]
        .sum()
    )
    uni = dict(zip(counts[counts["order"] == 1]["gram"], counts[counts["order"] == 1]["n"]))
    big = dict(zip(counts[counts["order"] == 2]["gram"], counts[counts["order"] == 2]["n"]))
    V = len(uni)
    model_ref = ray.put((uni, big, V))

    # ---- pass 2: scoring --------------------------------------------------
    def score(batch: pd.DataFrame, mref) -> pd.DataFrame:
        u, b, v = cached_get(mref)
        # tokenize + flatten with the SAME Arrow offset-arithmetic kernel
        # as _batch_bigram_counts: split once, mask each doc's last token,
        # derive the left-token and joined-bigram arrays without touching
        # any Python token loop
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pa.array(batch["text"], type=pa.string())),
            r"\s+",
        )
        off = toks.offsets.to_numpy()
        n_toks = np.diff(off).astype(np.int64)
        n_pairs = np.maximum(n_toks - 1, 0)
        vals = toks.values
        valid = np.ones(len(vals), dtype=bool)
        ends = off[1:]
        valid[ends[ends > 0] - 1] = False  # each doc's last token
        left_idx = np.flatnonzero(valid)
        lefts_arr = vals.take(pa.array(left_idx))
        pairs_arr = pc.binary_join_element_wise(
            lefts_arr, vals.take(pa.array(left_idx + 1)), " "
        )
        bc = pd.Series(pairs_arr.to_pandas(), dtype=object).map(b).fillna(0).to_numpy(dtype=np.float64)
        uc = pd.Series(lefts_arr.to_pandas(), dtype=object).map(u).fillna(0).to_numpy(dtype=np.float64)
        lp = np.log2((bc + 1) / (uc + v))
        # per-doc mean in token order: segment sums via cumsum + offsets
        ends = np.cumsum(n_pairs)
        cs = np.concatenate([[0.0], np.cumsum(lp)]) if len(lp) else np.array([0.0])
        seg = cs[ends] - cs[ends - n_pairs]
        avg = np.where(n_pairs > 0, seg / np.maximum(n_pairs, 1), 0.0)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_toks,
                "avg_logp": np.round(avg, 6),
                "ppl": np.round(2.0 ** (-avg), 4),
            }
        )

    out = (
        ds.map_batches(score, fn_kwargs={"mref": model_ref}, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # ---- sequential oracle (exact, size-gated) ----------------------------
    if self_oracle_enabled(len(out), "lm_perplexity"):
        seq = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        s_uni: dict = {}
        s_big: dict = {}
        for text in seq["text"]:
            ws = text.strip().split() or [""]
            for w in ws:
                s_uni[w] = s_uni.get(w, 0) + 1
            for a, c in zip(ws, ws[1:]):
                k = f"{a} {c}"
                s_big[k] = s_big.get(k, 0) + 1
        if s_uni != uni or s_big != big:
            raise AssertionError("distributed LM counts diverged from sequential")
        # per-doc score check vs a direct (non-segmented) evaluation
        want = np.zeros(len(seq))
        for i, text in enumerate(seq["text"]):
            ws = text.strip().split() or [""]
            if len(ws) < 2:
                continue
            lps = [
                np.log2((s_big.get(f"{a} {c}", 0) + 1) / (s_uni.get(a, 0) + V))
                for a, c in zip(ws, ws[1:])
            ]
            want[i] = float(np.sum(lps)) / (len(ws) - 1)
        got = out.set_index("doc_id").loc[seq["doc_id"]]["avg_logp"].to_numpy()
        if not np.allclose(got, np.round(want, 6), atol=1e-5):
            raise AssertionError("distributed LM scores diverged from sequential")
    return out


def bm25_topk(
    sf_dir: str,
    query: str | None = None,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> pd.DataFrame:
    """BM25 keyword retrieval over the corpus — the lexical-search
    counterpart to the ANN family (Robertson/Sparck Jones probabilistic
    weighting, the Lucene `(1 + (N - df + .5)/(df + .5))` idf form).

    Scale shape, two bounded passes, nothing corpus-scale off-cluster:

      1. stats pass: per batch, for the QUERY TERMS ONLY, a (term, df)
         partial plus one corpus-stats sentinel row (n_docs, total_tokens)
         — |terms|+1 rows per batch, folded on the driver;
      2. scoring pass: per batch, vectorized token-boundary regex counts
         per query term -> BM25 -> per-batch partial top-k (like the ANN
         scorers); the driver merges the bounded partials.

    Tokenization = whitespace split, term matches are whole-token
    (``(?<!\\S)term(?!\\S)``), consistent with ``term_doc_frequency``.
    ``query=None`` derives a deterministic demo query from the corpus's
    top-3 DF terms. A sequential pandas recompute oracle asserts scores
    in-process on every call (fixture-scale read, same family as
    ``lm_perplexity``)."""
    import re as _re

    if query is None:
        query = " ".join(term_doc_frequency(sf_dir, k=3)["term"])
    terms = list(dict.fromkeys(query.strip().split()))
    if not terms:
        raise ValueError("bm25_topk: empty query")
    pats = {t: _re.compile(rf"(?<!\S){_re.escape(t)}(?!\S)") for t in terms}

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
        txt = batch["text"]
        n_toks = txt.str.strip().str.split().str.len().fillna(0).astype(np.int64)
        rows = {
            "term": ["\x00corpus"],
            "df": [0],
            "n_docs": [len(batch)],
            "total_toks": [int(n_toks.sum())],
        }
        for t in terms:
            rows["term"].append(t)
            rows["df"].append(int((txt.str.count(pats[t]) > 0).sum()))
            rows["n_docs"].append(0)
            rows["total_toks"].append(0)
        return pd.DataFrame(rows)

    folded = (
        ds.map_batches(stats_partial, batch_format="pandas")
        .to_pandas()  # bounded: batches x (|terms|+1) rows
        .groupby("term", as_index=False)
        .sum()
    )
    corpus = folded[folded["term"] == "\x00corpus"].iloc[0]
    n_docs = int(corpus["n_docs"])
    avgdl = max(float(corpus["total_toks"]) / max(n_docs, 1), 1e-9)
    df_map = dict(zip(folded["term"], folded["df"]))
    idf = {
        t: float(np.log(1.0 + (n_docs - df_map.get(t, 0) + 0.5) / (df_map.get(t, 0) + 0.5)))
        for t in terms
    }

    def score_partial(batch: pd.DataFrame) -> pd.DataFrame:
        txt = batch["text"]
        dl = txt.str.strip().str.split().str.len().fillna(0).to_numpy(dtype=np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        score = np.zeros(len(batch))
        for t in terms:
            tf = txt.str.count(pats[t]).to_numpy(dtype=np.float64)
            score += idf[t] * (tf * (k1 + 1.0)) / np.maximum(tf + norm, 1e-12)
        out = pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(), "score": np.round(score, 8)}
        )
        out = out[out["score"] > 0]
        return out.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)

    partials = ds.map_batches(score_partial, batch_format="pandas").to_pandas()
    top = (
        partials.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    top = top[["rank", "doc_id", "score"]].astype({"doc_id": "int64"})

    # ---- sequential oracle (exact recompute, size-gated) -------------------
    if self_oracle_enabled(n_docs, "bm25_topk"):
        seq = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        toks = seq["text"].str.strip().str.split().map(lambda ws: ws if isinstance(ws, list) else [])
        s_dl = toks.str.len().to_numpy(dtype=np.float64)
        assert int(len(seq)) == n_docs and abs(float(s_dl.sum()) / max(n_docs, 1) - avgdl) < 1e-9
        s_score = np.zeros(len(seq))
        s_norm = k1 * (1.0 - b + b * s_dl / avgdl)
        for t in terms:
            s_tf = toks.map(lambda ws, _t=t: ws.count(_t)).to_numpy(dtype=np.float64)
            s_df = int((s_tf > 0).sum())
            assert s_df == df_map.get(t, 0), f"df mismatch for {t!r}"
            s_idf = float(np.log(1.0 + (n_docs - s_df + 0.5) / (s_df + 0.5)))
            s_score += s_idf * (s_tf * (k1 + 1.0)) / np.maximum(s_tf + s_norm, 1e-12)
        s = pd.DataFrame({"doc_id": seq["doc_id"], "score": np.round(s_score, 8)})
        s = s[s["score"] > 0].sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
        if list(s["doc_id"]) != list(top["doc_id"]) or not np.allclose(
            s["score"].to_numpy(), top["score"].to_numpy(), atol=1e-6
        ):
            raise AssertionError("distributed BM25 diverged from sequential recompute")
    return top


def repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Within-document repetition signals (the Gopher repetition filters,
    Rae et al. 2021 — public recipe): per document, the fraction of 2-gram
    and 3-gram occurrences that are duplicates of an earlier occurrence,
    and the frequency share of the single most common token. High values
    flag the degenerate looping/boilerplate text every curation pipeline
    drops BEFORE training.

    Pure per-batch map (no shuffle): token hashes once per doc, n-gram
    hashes via the shared vectorized rolling combine (``dedup._roll``),
    duplicate fractions from ``np.unique`` counts. In-process oracle
    (size-gated): a sequential Counter recompute must match every row."""
    from canal_ray.ops.dedup import _roll
    from canal_ray.ops.util import parquet_num_rows, self_oracle_enabled

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _doc_stats(text: str) -> tuple[float, float, float]:
        toks = text.split() if isinstance(text, str) else []
        if not toks:
            return 0.0, 0.0, 0.0
        with np.errstate(over="ignore"):
            hw = pd.util.hash_array(np.array(toks, dtype=object)).astype(np.uint64)
            _, tok_counts = np.unique(hw, return_counts=True)
            top_tok = float(tok_counts.max()) / len(toks)
            fracs = []
            for n in (2, 3):
                if len(toks) < n:
                    fracs.append(0.0)
                    continue
                grams = _roll(hw, n)
                fracs.append(1.0 - len(np.unique(grams)) / len(grams))
        return fracs[0], fracs[1], top_tok

    def batch_stats(b: pd.DataFrame) -> pd.DataFrame:
        stats = [_doc_stats(t) for t in b["text"].tolist()]
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "dup_2gram_frac": np.round([s[0] for s in stats], 6),
                "dup_3gram_frac": np.round([s[1] for s in stats], 6),
                "top_token_frac": np.round([s[2] for s in stats], 6),
            }
        )

    out = (
        ds.map_batches(batch_stats, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    if self_oracle_enabled(
        parquet_num_rows(f"{sf_dir}/documents.parquet"), "repetition_stats"
    ):
        from collections import Counter

        seq = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        for did, text in zip(seq["doc_id"], seq["text"]):
            toks = text.split() if isinstance(text, str) else []
            row = out.loc[out["doc_id"] == did].iloc[0]
            if not toks:
                assert row["top_token_frac"] == 0.0
                continue
            want_top = Counter(toks).most_common(1)[0][1] / len(toks)
            assert abs(row["top_token_frac"] - round(want_top, 6)) < 1e-9
            for n, col in ((2, "dup_2gram_frac"), (3, "dup_3gram_frac")):
                grams = [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]
                want = 1.0 - len(set(grams)) / len(grams) if grams else 0.0
                assert abs(row[col] - round(want, 6)) < 1e-9, f"doc {did} {col}"
    return out
