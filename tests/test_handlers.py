"""Downstream handler SPI: before-transform on workers, after-ack on the
driver, and the fencing-safe retry loop (EntryEventSink.java:176-209).

Handler classes are built inside factory functions: classes defined at test
module top-level are cloudpickled BY REFERENCE and Ray workers cannot import
``test_handlers`` — function-local classes serialize by value.
"""

from __future__ import annotations

import os

import pytest

from canal_ray.config import CdcConfig
from canal_ray.handlers import DownstreamHandler
from canal_ray.loggen import generate_fixture
from canal_ray.oracle import replay_oracle, state_digest
from canal_ray.pipeline import CdcJob


def _drop_repo_handler(repo: str) -> DownstreamHandler:
    """Redaction-style before(): drop every event of one repo (worker-side)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    class DropRepoBefore(DownstreamHandler):
        def __init__(self, victim: str):
            self.victim = victim

        def before(self, batch: pa.Table) -> pa.Table:
            keep = pc.fill_null(
                pc.not_equal(batch["pk_repo"], pa.scalar(self.victim)), True
            )
            return batch.filter(keep)

    return DropRepoBefore(repo)


def _after_collector() -> DownstreamHandler:
    """Driver-side after(): records (epoch, events) in ack order."""

    class AfterCollector(DownstreamHandler):
        def __init__(self):
            self.acks: list[tuple[int, int]] = []

        def after(self, epoch: int, manifest: dict) -> None:
            self.acks.append((epoch, manifest["events"]))

    return AfterCollector()


def _chaos_handler(flag: str, vote_retry: bool) -> DownstreamHandler:
    """before() raises while the flag file exists (workers see the shared
    fs); retry() clears the flag and optionally votes to re-run the cycle."""

    class FlagFileChaos(DownstreamHandler):
        def __init__(self, flag_path: str, vote: bool):
            self.flag = flag_path
            self.vote = vote
            self.retries = 0

        def before(self, batch):
            if os.path.exists(self.flag):
                raise RuntimeError("injected sink failure")
            return batch

        def retry(self, exc: Exception, attempt: int) -> bool:
            self.retries += 1
            if self.vote and os.path.exists(self.flag):
                os.unlink(self.flag)
            return self.vote

    return FlagFileChaos(flag, vote_retry)


def _tamper_handler() -> DownstreamHandler:
    import pyarrow as pa

    class Tamper(DownstreamHandler):
        def before(self, batch: pa.Table) -> pa.Table:
            return batch.drop_columns(["ddl_sql"])

    return Tamper()


@pytest.fixture(scope="module")
def fix(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("handlers_fix"))
    generate_fixture(d, n_base=300, n_events=3_000, n_segments=4, seed=81)
    return d


def _cfg(fix: str, lake: str, **kw) -> CdcConfig:
    return CdcConfig(
        log_dir=f"{fix}/binlog", lake_dir=lake,
        base_table=f"{fix}/base/repos.parquet",
        num_partitions=4, epoch_segments=2, **kw,
    )


def _oracle(fix: str):
    df, _ = replay_oracle(
        fix, list(CdcConfig(log_dir="", lake_dir="").initial_schema)
    )
    return df


def test_before_transform_and_after_ack(ray_session, fix, tmp_path):
    oracle_df = _oracle(fix)
    victim = oracle_df["repo"].iloc[0]
    coll = _after_collector()
    cfg = _cfg(fix, str(tmp_path / "lake"),
               handlers=(_drop_repo_handler(victim), coll))
    job = CdcJob(cfg)
    report = job.run()
    got = job.state_pandas()
    want = oracle_df[oracle_df["repo"] != victim].reset_index(drop=True)
    assert len(want) < len(oracle_df)
    assert state_digest(got) == state_digest(want)
    # after() fired once per epoch, in ack order, on the driver
    epochs = [e for e, _ in coll.acks]
    assert epochs == sorted(epochs) and epochs[-1] == report["last_epoch"]
    assert sum(n for _, n in coll.acks) == report["events"]


def test_retry_reruns_failed_cycle_exactly_once_effect(ray_session, fix, tmp_path):
    flag = str(tmp_path / "chaos.flag")
    open(flag, "w").close()
    chaos = _chaos_handler(flag, vote_retry=True)
    cfg = _cfg(fix, str(tmp_path / "lake"), handlers=(chaos,))
    job = CdcJob(cfg)
    job.run()
    assert chaos.retries >= 1 and not os.path.exists(flag)
    assert state_digest(job.state_pandas()) == state_digest(_oracle(fix))


def test_no_retry_vote_propagates(ray_session, fix, tmp_path):
    flag = str(tmp_path / "fatal.flag")
    open(flag, "w").close()
    cfg = _cfg(fix, str(tmp_path / "lake"),
               handlers=(_chaos_handler(flag, vote_retry=False),))
    with pytest.raises(Exception, match="injected sink failure"):
        CdcJob(cfg).run()
    os.unlink(flag)


def test_schema_tamper_rejected(ray_session, fix, tmp_path):
    cfg = _cfg(fix, str(tmp_path / "lake"), handlers=(_tamper_handler(),))
    with pytest.raises(Exception, match="DECODED_SCHEMA|wire schema"):
        CdcJob(cfg).run()


def test_after_hook_at_least_once_across_crash(ray_session, fix, tmp_path):
    """after() is at-least-once: if the process dies between an epoch's
    durable ack and the hook (or a handler raises inside after()), the next
    run() replays the hook for every acked-but-unfired epoch."""
    import os as _os

    from canal_ray.checkpoint import atomic_write_json, read_json

    coll = _after_collector()
    cfg = _cfg(fix, str(tmp_path / "lake"), handlers=(coll,))
    job = CdcJob(cfg)
    report = job.run()
    fired = [e for e, _ in coll.acks]
    assert fired and fired[-1] == report["last_epoch"]

    # simulate the crash window: acks durable, after-cursor behind by 2
    cur_path = _os.path.join(job.store.ckpt_dir, "after_cursor.json")
    cur = read_json(cur_path)
    assert cur is not None and int(cur["fired_through"]) == report["last_epoch"]
    atomic_write_json(cur_path, {"fired_through": report["last_epoch"] - 2})

    coll2 = _after_collector()
    cfg2 = _cfg(fix, str(tmp_path / "lake"), handlers=(coll2,))
    job2 = CdcJob(cfg2)
    job2.run()  # no new epochs — only the replay fires
    replayed = [e for e, _ in coll2.acks]
    assert replayed == [report["last_epoch"] - 1, report["last_epoch"]]
    # cursor restored; a third run replays nothing
    coll3 = _after_collector()
    CdcJob(_cfg(fix, str(tmp_path / "lake"), handlers=(coll3,))).run()
    assert coll3.acks == []


def _alarm_collector(raise_on_alarm: bool = False) -> DownstreamHandler:
    """Driver-side alarm() recorder (CanalAlarmHandler analog); optionally
    raises to prove alarm delivery failures never kill the apply."""

    class AlarmCollector(DownstreamHandler):
        def __init__(self, boom: bool):
            self.boom = boom
            self.alarms: list[tuple[str, dict]] = []

        def alarm(self, kind: str, detail: dict) -> None:
            self.alarms.append((kind, dict(detail)))
            if self.boom:
                raise RuntimeError("alerting endpoint down")

    return AlarmCollector(raise_on_alarm)


def test_alarm_on_poison_rows(ray_session, tmp_path):
    """Quarantined poison rows fire alarm('poison_rows') on the driver, and
    a raising alarm handler is swallowed (replication must not depend on the
    alerting endpoint)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from canal_ray.loggen import EPOCH_MS, LOG_SCHEMA

    d = str(tmp_path / "fix")
    meta = generate_fixture(d, n_base=200, n_events=2_000, n_segments=2, seed=19)
    # one un-castable numeric (stars) event in an appended segment
    seg_dir = os.path.join(d, "binlog")
    idx = len(os.listdir(seg_dir))
    lsn = meta["last_lsn"] + 1
    row = {
        "lsn": lsn, "segment": idx, "txn_id": 10**6, "op": "UPDATE",
        "schema_name": "mytest", "table_name": "repos",
        "pk_repo": "org0/repo0", "pk_path": "src/m0/f0.py",
        "cols": ["repo", "path", "commit", "lang", "content", "stars", "license"],
        "vals": ["org0/repo0", "src/m0/f0.py", "c" * 40, "python", "x",
                 "NOT_A_NUMBER", "mit"],
        "ddl_sql": None, "execute_time": EPOCH_MS + lsn * 10,
    }
    pq.write_table(
        pa.Table.from_pylist([row], schema=LOG_SCHEMA),
        os.path.join(seg_dir, f"segment_{idx:05d}.parquet"),
    )
    coll = _alarm_collector(raise_on_alarm=True)
    cfg = _cfg(d, str(tmp_path / "lake"), handlers=(coll,))
    with pytest.warns(UserWarning, match="alarm handler"):
        CdcJob(cfg).run()  # must complete despite the raising alarm hook
    kinds = [k for k, _ in coll.alarms]
    assert "poison_rows" in kinds
    detail = dict(coll.alarms)[("poison_rows")]
    assert detail["rows"] == 1 and detail["epoch"] >= 0


def test_alarm_on_cycle_failure(ray_session, fix, tmp_path):
    """A failing cycle fires alarm('cycle_failure') before the retry vote;
    the retried run still converges to the oracle."""
    flag = str(tmp_path / "chaos.flag")
    open(flag, "w").close()
    chaos = _chaos_handler(flag, vote_retry=True)
    coll = _alarm_collector()
    cfg = _cfg(fix, str(tmp_path / "lake"), handlers=(chaos, coll))
    job = CdcJob(cfg)
    job.run()
    kinds = [k for k, _ in coll.alarms]
    assert "cycle_failure" in kinds
    d = [det for k, det in coll.alarms if k == "cycle_failure"][0]
    # Ray wraps the worker exception (RayTaskError), so match the wrapper
    assert d["error"] and d["epochs"]
    assert state_digest(job.state_pandas()) == state_digest(_oracle(fix))
