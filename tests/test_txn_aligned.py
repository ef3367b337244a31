"""Txn-aligned epochs (EventTransactionBuffer analog): ack points never
split a transaction even when transactions span segment files.

Reference semantics: ``sink/.../EventTransactionBuffer.java`` holds events
until the transaction completes so downstream acks are txn-whole; here the
epoch planner shifts each ack point back to the last complete-txn lsn and
the next epoch re-reads the overlap segment under an lsn window.
"""

from __future__ import annotations

import glob
import os
import shutil

import pandas as pd
import pytest

from canal_ray.config import CdcConfig
from canal_ray.loggen import generate_fixture
from canal_ray.oracle import replay_oracle, state_digest
from canal_ray.pipeline import CdcJob


@pytest.fixture(scope="module")
def fix(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("txn_fix"))
    generate_fixture(
        d, n_base=400, n_events=4_000, n_segments=4, seed=91, txn_span=True
    )
    return d


def _txn_of(fix: str) -> pd.Series:
    """lsn -> txn_id over the whole log (test-side ground truth)."""
    frames = [
        pd.read_parquet(p, columns=["lsn", "txn_id"])
        for p in sorted(glob.glob(f"{fix}/binlog/*.parquet"))
    ]
    df = pd.concat(frames).sort_values("lsn")
    return df.set_index("lsn")["txn_id"]


def test_fixture_actually_spans_segments(fix):
    segs = sorted(glob.glob(f"{fix}/binlog/*.parquet"))
    spans = 0
    for a, b in zip(segs, segs[1:]):
        last = pd.read_parquet(a, columns=["txn_id"])["txn_id"].iloc[-1]
        first = pd.read_parquet(b, columns=["txn_id"])["txn_id"].iloc[0]
        spans += int(last == first)
    assert spans >= 1  # the generator contract is really dropped


def _cfg(fix: str, lake: str, **kw) -> CdcConfig:
    return CdcConfig(
        log_dir=f"{fix}/binlog", lake_dir=lake,
        base_table=f"{fix}/base/repos.parquet",
        num_partitions=4, epoch_segments=1, epochs_per_cycle=2,
        txn_aligned_epochs=True, **kw,
    )


def test_acks_are_txn_whole_and_state_exact(ray_session, fix, tmp_path):
    cfg = _cfg(fix, str(tmp_path / "lake"))
    job = CdcJob(cfg)

    # partial run: 3 epochs (bootstrap + 2 log epochs), mid-cycle boundary
    job.run(max_epochs=3)
    txn = _txn_of(fix)
    manifests = []
    e = 1
    while (m := job.store.read_epoch(e)) is not None:
        manifests.append(m)
        e += 1
    assert manifests and all("lsn_hi" in m for m in manifests)
    # no interior ack point splits a transaction
    for m in manifests[:-1]:
        hi = m["lsn_hi"]
        nxt = hi + 1
        while nxt not in txn.index and nxt <= txn.index.max():
            nxt += 1  # lsn gaps cannot occur in this log, but be safe
        assert txn.loc[hi] != txn.loc[nxt], f"epoch {m['epoch']} split txn {txn.loc[hi]}"
    # the partial lake state == sequential oracle AT the last acked cut
    cut = manifests[-1]["lsn_hi"]
    want, _ = replay_oracle(
        fix, list(cfg.initial_schema), up_to_lsn=cut
    )
    assert state_digest(job.state_pandas()) == state_digest(want)

    # resume to completion with a FRESH job (cut recomputation determinism)
    job2 = CdcJob(cfg)
    job2.run()
    oracle_df, _ = replay_oracle(fix, list(cfg.initial_schema))
    assert state_digest(job2.state_pandas()) == state_digest(oracle_df)
    # interior acks still txn-whole over the full log
    e, last = 1, job2.store.last_complete_epoch()
    for e in range(1, last):
        m = job2.store.read_epoch(e)
        hi = m["lsn_hi"]
        assert txn.loc[hi] != txn.loc[hi + 1]


def test_tail_append_pins_acked_cuts(ray_session, fix, tmp_path):
    """A log that grows after an ack must not reinterpret acked boundaries:
    the final epoch acked through EOF keeps its manifest lsn_hi even though
    the appended segment continues its trailing txn."""
    live = str(tmp_path / "live")
    os.makedirs(f"{live}/binlog")
    shutil.copytree(f"{fix}/base", f"{live}/base")
    segs = sorted(glob.glob(f"{fix}/binlog/*.parquet"))
    for s in segs[:2]:
        shutil.copy(s, f"{live}/binlog/")
    cfg = _cfg(live, str(tmp_path / "lake"))
    job = CdcJob(cfg)
    job.run()
    last1 = job.store.last_complete_epoch()
    pinned = job.store.read_epoch(last1)["lsn_hi"]

    for s in segs[2:]:
        shutil.copy(s, f"{live}/binlog/")
    job2 = CdcJob(cfg)
    job2.run()
    assert job2.store.read_epoch(last1)["lsn_hi"] == pinned  # boundary immutable
    oracle_df, _ = replay_oracle(fix, list(cfg.initial_schema))
    assert state_digest(job2.state_pandas()) == state_digest(oracle_df)


def test_composes_with_sort_exchange_and_row_filter(ray_session, fix, tmp_path):
    """txn alignment must hold on BOTH exchanges and compose with a content
    predicate: the filtered lake equals the filtered sequential oracle."""
    cfg = _cfg(
        fix, str(tmp_path / "lake"),
        exchange="sort", row_filter="op == 'DELETE' or lang == 'python'",
    )
    job = CdcJob(cfg)
    job.run()
    oracle_df, _ = replay_oracle(fix, list(cfg.initial_schema))
    want = oracle_df[oracle_df["lang"] == "python"].reset_index(drop=True)
    assert state_digest(job.state_pandas()) == state_digest(want)
    txn = _txn_of(fix)
    last = job.store.last_complete_epoch()
    for e in range(1, last):
        hi = job.store.read_epoch(e)["lsn_hi"]
        assert txn.loc[hi] != txn.loc[hi + 1]


def test_txn_aligned_equals_default_when_no_spans(ray_session, tmp_path):
    """On a log whose txns never span segments, txn alignment must be a
    no-op: identical final state, cuts == segment boundaries."""
    d = str(tmp_path / "nospan")
    generate_fixture(d, n_base=200, n_events=2_000, n_segments=2, seed=92)
    lake_a, lake_b = str(tmp_path / "la"), str(tmp_path / "lb")
    base = dict(log_dir=f"{d}/binlog", base_table=f"{d}/base/repos.parquet",
                num_partitions=2, epoch_segments=1)
    ja = CdcJob(CdcConfig(lake_dir=lake_a, txn_aligned_epochs=True, **base))
    jb = CdcJob(CdcConfig(lake_dir=lake_b, **base))
    ja.run()
    jb.run()
    assert state_digest(ja.state_pandas()) == state_digest(jb.state_pandas())

@pytest.mark.parametrize(
    "gen,jobkw",
    [
        # spanning txns + rename + drop + minimal row images, scatter
        (dict(seed=95, txn_span=True, rename_at=0.4, drop_at=0.7, p_partial=0.15),
         dict(partial_updates=True, exchange="scatter", epochs_per_cycle=3)),
        # spanning txns + TRUNCATE mid-stream, sort exchange
        (dict(seed=96, txn_span=True, truncate_at=0.5),
         dict(exchange="sort", num_partitions=3)),
        # spanning txns + full DDL matrix + truncate together
        (dict(seed=97, txn_span=True, rename_at=0.3, drop_at=0.8,
              truncate_at=0.55, p_partial=0.1),
         dict(partial_updates=True, epochs_per_cycle=2)),
    ],
)
def test_txn_alignment_composes_with_ddl_truncate_partials(
    ray_session, tmp_path, gen, jobkw
):
    """Stress matrix: txn-spanning logs composed with RENAME/DROP DDL,
    TRUNCATE and minimal row images must still equal the sequential oracle,
    with txn-whole interior acks."""
    d = str(tmp_path / "fix")
    generate_fixture(d, n_base=300, n_events=3_000, n_segments=4, **gen)
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet",
        num_partitions=jobkw.pop("num_partitions", 4),
        epoch_segments=1, txn_aligned_epochs=True, **jobkw,
    )
    job = CdcJob(cfg)
    job.run(max_epochs=3)   # partial ...
    job2 = CdcJob(cfg)
    job2.run()              # ... resumed by a fresh job
    oracle_df, _ = replay_oracle(d, list(cfg.initial_schema))
    assert state_digest(job2.state_pandas()) == state_digest(oracle_df)
    txn = _txn_of(d)
    last = job2.store.last_complete_epoch()
    for e in range(1, last):
        hi = job2.store.read_epoch(e)["lsn_hi"]
        assert txn.loc[hi] != txn.loc[hi + 1], f"epoch {e} split a txn"


def test_multi_segment_spanning_txn_carry(ray_session, tmp_path):
    """Tiny segments force transactions to span SEVERAL files (and whole
    epochs to sit inside one txn — the degenerate empty-window case): the
    overlap carry must re-read every file still holding deferred rows, or
    events are silently lost at cycle boundaries."""
    d = str(tmp_path / "fix")
    generate_fixture(d, n_base=40, n_events=120, n_segments=6, seed=98,
                     txn_span=True)
    # verify the fixture really has a txn covering >= 2 full segments
    segs = sorted(glob.glob(f"{d}/binlog/*.parquet"))
    whole = 0
    for s in segs:
        t = pd.read_parquet(s, columns=["txn_id"])["txn_id"]
        whole += int(t.nunique() == 1)
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet", num_partitions=2,
        epoch_segments=1, epochs_per_cycle=1,  # every epoch its own cycle
        txn_aligned_epochs=True,
    )
    job = CdcJob(cfg)
    job.run()
    oracle_df, _ = replay_oracle(d, list(cfg.initial_schema))
    assert state_digest(job.state_pandas()) == state_digest(oracle_df)
    txn = _txn_of(d)
    last = job.store.last_complete_epoch()
    for e in range(1, last):
        hi = job.store.read_epoch(e)["lsn_hi"]
        if hi == 0:
            continue  # degenerate empty window (epoch inside one txn)
        assert txn.loc[hi] != txn.loc[hi + 1]


def test_tail_hold_back_never_splits_inflight_txn(ray_session, fix, tmp_path):
    """Live tail: each poll's EOF is a poll artifact, not a txn boundary —
    run(hold_trailing_txn=True) must stop every ack BEFORE the trailing txn,
    and the final batch flush delivers the held tail exactly once."""
    live = str(tmp_path / "live")
    os.makedirs(f"{live}/binlog")
    shutil.copytree(f"{fix}/base", f"{live}/base")
    segs = sorted(glob.glob(f"{fix}/binlog/*.parquet"))
    cfg = _cfg(live, str(tmp_path / "lake"))
    job = CdcJob(cfg)
    txn = _txn_of(fix)

    for s in segs:  # one segment arrives per poll
        shutil.copy(s, f"{live}/binlog/")
        job.run(hold_trailing_txn=True)
        # EVERY ack so far (incl. the tail epoch) sits on a txn boundary
        e = 1
        while (m := job.store.read_epoch(e)) is not None:
            hi = m["lsn_hi"]
            if hi > 0 and hi + 1 in txn.index:
                assert txn.loc[hi] != txn.loc[hi + 1], f"epoch {e} split a txn"
            e += 1

    # end of stream: flush the held trailing txn (batch semantics at EOF)
    job.run()
    oracle_df, _ = replay_oracle(fix, list(cfg.initial_schema))
    assert state_digest(job.state_pandas()) == state_digest(oracle_df)
    # re-run is fully fenced
    assert CdcJob(cfg).run()["epochs_processed"] == 0
