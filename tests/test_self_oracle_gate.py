"""Round-5 hardening tests.

1. The in-op self-oracle size gate (VERDICT r4 finding 1 / directive 2):
   every registered op must run UNCHANGED at 100x, so the sequential
   verification recomputes auto-skip above CANAL_SELF_ORACLE_MAX_ROWS.
   Both branches are proven here: oracle ON yields the identical result as
   oracle SKIPPED, and the skip logs a warning naming the op.
2. ADVICE r4 regressions: distributed CC must raise (never return partial
   labels) when propagation fails to converge in max_rounds; BM25 and the
   token-stats family must tolerate NULL text; the sliding window must be
   correct for pre-epoch / near-epoch timestamps.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pytest


def _mini_docs(tmp_path, rows):
    df = pd.DataFrame(rows)
    df["lang"] = "en"
    df["source"] = "s"
    df["n_chars"] = df["text"].map(lambda t: len(t) if isinstance(t, str) else 0)
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_gate_unit(monkeypatch, caplog):
    from canal_ray.ops.util import SELF_ORACLE_DEFAULT_MAX_ROWS, self_oracle_enabled

    monkeypatch.delenv("CANAL_SELF_ORACLE_MAX_ROWS", raising=False)
    assert self_oracle_enabled(10, "x")
    assert self_oracle_enabled(SELF_ORACLE_DEFAULT_MAX_ROWS, "x")
    with caplog.at_level(logging.WARNING, logger="canal_ray.self_oracle"):
        assert not self_oracle_enabled(SELF_ORACLE_DEFAULT_MAX_ROWS + 1, "bigop")
    assert "bigop" in caplog.text and "SKIPPED" in caplog.text

    monkeypatch.setenv("CANAL_SELF_ORACLE_MAX_ROWS", "5")
    assert self_oracle_enabled(5, "x")
    assert not self_oracle_enabled(6, "x")
    # negative cap = force oracles on at any size
    monkeypatch.setenv("CANAL_SELF_ORACLE_MAX_ROWS", "-1")
    assert self_oracle_enabled(10**12, "x")
    # zero cap = oracles off entirely
    monkeypatch.setenv("CANAL_SELF_ORACLE_MAX_ROWS", "0")
    assert not self_oracle_enabled(1, "x")


def test_parquet_num_rows(tmp_path):
    from canal_ray.ops.util import parquet_num_rows

    p = _mini_docs(tmp_path, [{"doc_id": i, "text": "a b"} for i in range(7)])
    assert parquet_num_rows(f"{p}/documents.parquet") == 7


def test_bpe_gate_both_branches(ray_session, tmp_path, monkeypatch, caplog):
    """bpe_token_counts returns the identical distributed result whether its
    sequential oracle runs (default) or is size-gated off (cap=0)."""
    from canal_ray.ops.text import bpe_token_counts

    p = _mini_docs(
        tmp_path,
        [{"doc_id": i, "text": f"hello world {i} don't stop"} for i in range(6)],
    )
    monkeypatch.delenv("CANAL_SELF_ORACLE_MAX_ROWS", raising=False)
    with_oracle = bpe_token_counts(p)

    monkeypatch.setenv("CANAL_SELF_ORACLE_MAX_ROWS", "0")
    with caplog.at_level(logging.WARNING, logger="canal_ray.self_oracle"):
        without = bpe_token_counts(p)
    assert "bpe_token_counts" in caplog.text and "SKIPPED" in caplog.text
    pd.testing.assert_frame_equal(with_oracle, without)


def test_bm25_gate_skip_branch(ray_session, tmp_path, monkeypatch):
    """bm25_topk with the oracle gated off still returns the ranked top-k
    (the distributed path is the contract; the oracle is a verification
    device)."""
    from canal_ray.ops.text import bm25_topk

    rows = [{"doc_id": i, "text": "apple pad pad"} for i in range(4)]
    rows.append({"doc_id": 9, "text": "apple apple apple"})
    p = _mini_docs(tmp_path, rows)
    monkeypatch.setenv("CANAL_SELF_ORACLE_MAX_ROWS", "0")
    out = bm25_topk(p, query="apple", k=3)
    assert list(out["doc_id"])[0] == 9 and len(out) == 3


def test_cdc_smoke_gate_skip_branch(ray_session, monkeypatch):
    """cdc_replay_smoke with the oracle gated off still replays and returns
    the lake state (rows preserved vs the oracle-on call)."""
    from canal_ray.ops.cdc_smoke import cdc_replay_smoke

    monkeypatch.delenv("CANAL_SELF_ORACLE_MAX_ROWS", raising=False)
    with_oracle = cdc_replay_smoke("unused")
    monkeypatch.setenv("CANAL_SELF_ORACLE_MAX_ROWS", "0")
    without = cdc_replay_smoke("unused")
    pd.testing.assert_frame_equal(with_oracle, without)


def test_cc_nonconvergence_raises(ray_session, tmp_path):
    """ADVICE r4 (medium): a component wider than max_rounds must raise, not
    silently return partially-propagated labels."""
    from canal_ray.ops.dedup import _label_components_distributed

    docs = pd.DataFrame({"doc_id": list(range(6)), "text": "x"})
    docs["lang"] = "en"; docs["source"] = "s"; docs["n_chars"] = 1
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    # chain 0-1-2-3-4-5: diameter 5, cannot converge in 1 round
    pairs = pd.DataFrame({"doc_a": [0, 1, 2, 3, 4], "doc_b": [1, 2, 3, 4, 5]})
    with pytest.raises(RuntimeError, match="did not converge"):
        _label_components_distributed(str(tmp_path), pairs, max_rounds=1)
    # and with enough rounds the same input converges to one component
    ok = _label_components_distributed(str(tmp_path), pairs, max_rounds=8)
    assert list(ok["dup_of"]) == [0] * 6


def test_cc_partitions_env_override(ray_session, tmp_path, monkeypatch):
    """ADVICE r4 (low): the exchange width is derivable/overridable, not a
    hardcoded 16."""
    from canal_ray.ops.dedup import _label_components, _label_components_distributed

    docs = pd.DataFrame({"doc_id": list(range(8)), "text": "x"})
    docs["lang"] = "en"; docs["source"] = "s"; docs["n_chars"] = 1
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    pairs = pd.DataFrame({"doc_a": [0, 2], "doc_b": [1, 3]})
    monkeypatch.setenv("CANAL_CC_PARTITIONS", "3")
    dist = _label_components_distributed(str(tmp_path), pairs)
    want = _label_components(str(tmp_path), pairs)
    pd.testing.assert_frame_equal(
        dist.reset_index(drop=True), want.reset_index(drop=True)
    )


def test_bm25_and_token_stats_null_text(ray_session, tmp_path):
    """ADVICE r4 (low): NULL text must not crash the ops — str.split() maps
    NULL to NaN which is TRUTHY, so the guards must type-check."""
    from canal_ray.ops.text import bm25_topk, token_stats

    rows = [
        {"doc_id": 0, "text": "apple apple banana"},
        {"doc_id": 1, "text": None},
        {"doc_id": 2, "text": "apple"},
        {"doc_id": 3, "text": ""},
    ]
    p = _mini_docs(tmp_path, rows)
    out = bm25_topk(p, query="apple banana", k=4)
    assert set(out["doc_id"]) == {0, 2}  # null + empty docs excluded

    stats = token_stats(p).set_index("doc_id")
    # null and empty text both land on the ['']-token convention (n_tokens=1)
    assert int(stats.loc[1, "n_tokens"]) == 1
    assert int(stats.loc[3, "n_tokens"]) == 1


def test_sliding_window_near_epoch(ray_session, tmp_path):
    """ADVICE r4 (low): pre-epoch/near-epoch day numbers (dayno <= 0) must
    not let a window cross into the previous user's key range."""
    from canal_ray.ops.relational import user_sliding_window_stats

    def ts(day):  # day 0 = 1970-01-01; negative = pre-epoch
        return pd.Timestamp("1970-01-01") + pd.Timedelta(days=day)

    rows = []
    for d in (-2, -1, 0, 1):
        rows.append({"user_id": 1, "ts": ts(d), "value": 1.0})
    for d in (-2, 0):
        rows.append({"user_id": 2, "ts": ts(d), "value": 1.0})
    df = pd.DataFrame(rows)
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    df["event_type"] = "view"
    df.to_parquet(tmp_path / "events.parquet", index=False)

    out = user_sliding_window_stats(str(tmp_path), days=3)
    got = {
        (int(r["user_id"]), pd.Timestamp(r["day"])): int(r["n_7d"])
        for _, r in out.iterrows()
    }
    assert got == {
        (1, ts(-2)): 1, (1, ts(-1)): 2, (1, ts(0)): 3, (1, ts(1)): 3,
        (2, ts(-2)): 1, (2, ts(0)): 2,
    }
