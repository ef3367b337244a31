"""Property tests — the randomized-DDL-replay shape of the reference's
``MemoryTableMeta_Random_DDL_Test`` plus engine-level invariants:

  1. TableSchema DDL replay vs an independent dict model (hypothesis).
  2. Execution-shape invariance: the same log replayed under different
     epoch sizes / cycle sizes / partition counts / exchange modes yields a
     byte-identical final state (the determinism that makes offset fencing
     and resume sound).
  3. Per-key order: every surviving key's stored ``_lsn`` equals the max lsn
     of its surviving event (per-partition LWW is total-order faithful).
"""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from canal_ray.config import CdcConfig
from canal_ray.ddl import TableSchema
from canal_ray.oracle import replay_oracle, state_digest
from canal_ray.pipeline import CdcJob

# --- 1. DDL replay vs model -------------------------------------------------

_COL_NAMES = ["c1", "c2", "c3", "c4", "c5"]
_TYPES = ["INT", "BIGINT", "DOUBLE", "VARCHAR"]
_ARROW = {"INT": "int32", "BIGINT": "int64", "DOUBLE": "float64", "VARCHAR": "string"}
_WIDENS = {("int32", "int64"), ("int32", "float64"), ("int64", "float64")}


ddl_ops = st.lists(
    st.tuples(
        st.sampled_from(["ADD", "MODIFY"]),
        st.sampled_from(_COL_NAMES),
        st.sampled_from(_TYPES),
    ),
    min_size=1,
    max_size=12,
)


@given(ddl_ops)
@settings(max_examples=200, deadline=None)
def test_schema_replay_matches_model(seq):
    schema = TableSchema([("repo", "string"), ("path", "string")])
    model: dict[str, str] = {"repo": "string", "path": "string"}
    order = ["repo", "path"]
    for kind, col, sql_typ in seq:
        typ = _ARROW[sql_typ]
        if kind == "ADD":
            sql = f"ALTER TABLE mytest.repos ADD COLUMN {col} {sql_typ} NULL"
        else:
            sql = f"ALTER TABLE mytest.repos MODIFY COLUMN {col} {sql_typ}"
        try:
            schema.apply(sql)
            applied = True
        except ValueError:
            applied = False  # non-additive narrowing rejected
        if kind == "ADD":
            if col not in model:
                model[col] = typ
                order.append(col)
        else:
            old = model.get(col)
            if old is not None and old != typ:
                if (old, typ) in _WIDENS:
                    model[col] = typ
                else:
                    assert not applied  # engine must also have rejected
                    return  # model diverges by construction; stop this example
    assert schema.names() == order
    assert dict(schema.columns()) == model


# --- 2 + 3. engine invariants ----------------------------------------------

@pytest.fixture(scope="module")
def prop_fixture(tmp_path_factory):
    from canal_ray.loggen import generate_fixture

    d = str(tmp_path_factory.mktemp("prop"))
    generate_fixture(d, n_base=600, n_events=6_000, n_segments=6, seed=29)
    return d


@pytest.mark.parametrize(
    "shape",
    [
        dict(num_partitions=2, epoch_segments=1, epochs_per_cycle=1, exchange="sort"),
        dict(num_partitions=8, epoch_segments=3, epochs_per_cycle=2, exchange="sort"),
        dict(num_partitions=16, epoch_segments=6, epochs_per_cycle=4, exchange="sort"),
        dict(num_partitions=8, epoch_segments=2, epochs_per_cycle=3, exchange="scatter"),
    ],
)
def test_execution_shape_invariance(ray_session, prop_fixture, tmp_path, shape):
    d = prop_fixture
    cfg = CdcConfig(
        log_dir=f"{d}/binlog",
        lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet",
        **shape,
    )
    job = CdcJob(cfg)
    job.run()
    oracle_df, _ = replay_oracle(d, list(cfg.initial_schema))
    assert state_digest(job.state_pandas()) == state_digest(oracle_df)


def test_per_key_lsn_is_max_surviving(ray_session, prop_fixture, tmp_path):
    from canal_ray.loggen import segment_paths

    d = prop_fixture
    cfg = CdcConfig(
        log_dir=f"{d}/binlog",
        lake_dir=str(tmp_path / "lakek"),
        base_table=f"{d}/base/repos.parquet",
        num_partitions=4,
        epoch_segments=3,
    )
    job = CdcJob(cfg)
    job.run()
    eng = job.read_state(keep_lsn=True).to_pandas()

    log = pd.concat([pq.read_table(s).to_pandas() for s in segment_paths(d)])
    dml = log[
        (log["table_name"] == "repos") & log["op"].isin(["INSERT", "UPDATE", "DELETE"])
    ]
    last = (
        dml.sort_values("lsn")
        .groupby(["pk_repo", "pk_path"], as_index=False)
        .last()[["pk_repo", "pk_path", "lsn"]]
    )
    merged = eng.merge(
        last, left_on=["repo", "path"], right_on=["pk_repo", "pk_path"], how="left"
    )
    touched = merged[merged["lsn"].notna()]
    assert (touched["_lsn"] == touched["lsn"]).all()
    untouched = merged[merged["lsn"].isna()]
    assert (untouched["_lsn"] == 0).all()  # pristine base rows keep lsn 0


# ---------------------------------------------------------------- r5 codecs
@given(
    w=st.integers(min_value=1, max_value=23),
    h=st.integers(min_value=1, max_value=17),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_ppm_bmp_roundtrip_property(w, h, seed):
    """encode->decode is the identity for every image shape (BMP row padding
    covers every width mod 4; PPM is offset-exact)."""
    import numpy as np

    from canal_ray.ops.multimodal import decode_bmp, decode_ppm, encode_bmp, encode_ppm

    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    for enc, dec in ((encode_ppm, decode_ppm), (encode_bmp, decode_bmp)):
        ww, hh, c, out = dec(enc(px))
        assert (ww, hh, c) == (w, h, 3)
        assert (out == px).all()


@given(
    n=st.integers(min_value=1, max_value=2_000),
    sr=st.sampled_from([8_000, 16_000, 22_050, 44_100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_wav_roundtrip_property(n, sr, seed):
    import numpy as np

    from canal_ray.ops.multimodal import decode_wav, encode_wav

    x = np.random.default_rng(seed).integers(-32768, 32768, size=n).astype(np.int16)
    sr2, y = decode_wav(encode_wav(x, sr))
    assert sr2 == sr and (y == x).all()


@given(
    days=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=15, deadline=None)
def test_sliding_window_matches_bruteforce(ray_session, tmp_path_factory, days, seed):
    """user_sliding_window_stats equals a per-user brute-force trailing-window
    recount for random (possibly pre-epoch) day sets — the packed-key
    searchsorted slide can never cross users or miscount a window."""
    import numpy as np
    import pandas as pd

    from canal_ray.ops.relational import user_sliding_window_stats

    rng = np.random.default_rng(seed)
    rows = []
    for uid in range(1, int(rng.integers(2, 5)) + 1):
        daynos = rng.choice(np.arange(-12, 30), size=int(rng.integers(1, 10)), replace=False)
        for d in daynos:
            for _ in range(int(rng.integers(1, 3))):
                rows.append(
                    {
                        "user_id": uid,
                        "ts": pd.Timestamp("1970-01-01")
                        + pd.Timedelta(days=int(d), hours=int(rng.integers(0, 24))),
                        "value": float(rng.integers(0, 100)) / 10.0,
                    }
                )
    df = pd.DataFrame(rows)
    d = tmp_path_factory.mktemp("slidewin")
    df.to_parquet(d / "events.parquet", index=False)

    got = user_sliding_window_stats(str(d), days=days)

    # brute force: for every (user, active day), recount the trailing window
    df["day"] = df["ts"].dt.floor("D")
    df["value_c"] = np.round(df["value"] * 10_000).astype(np.int64)
    for _, r in got.iterrows():
        lo = r["day"] - pd.Timedelta(days=days - 1)
        m = (df["user_id"] == r["user_id"]) & (df["day"] >= lo) & (df["day"] <= r["day"])
        assert int(r["n_7d"]) == int(m.sum())
        assert int(r["total_value_c_7d"]) == int(df.loc[m, "value_c"].sum())
    # every (user, active day) pair is present
    assert len(got) == len(df[["user_id", "day"]].drop_duplicates())
