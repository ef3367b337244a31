"""The two self-oracled driver-surface smoke ops added round 3: FlatMessage
producer (MQ surface) and the metrics stream (Prometheus surface). Each op
asserts its own invariant in-process on every call; here we just drive them
through the same queries() entry the driver uses and sanity-check shape."""

from __future__ import annotations


def test_cdc_flat_produce_surface(ray_session):
    import __ray_entry__ as entrymod

    df = entrymod.queries()["cdc_flat_produce"]("/root/testdata/sf0.001")
    # per-op message counts, every op family of the smoke fixture present
    assert set(df.columns) == {"op", "n_messages"}
    assert {"INSERT", "UPDATE", "DELETE", "DDL", "MHEARTBEAT"} <= set(df["op"])
    assert (df["n_messages"] > 0).all()


def test_cdc_metrics_stream_surface(ray_session):
    import __ray_entry__ as entrymod

    from canal_ray.metrics import ACK_ROWS, PUT_ROWS

    df = entrymod.queries()["cdc_metrics_stream"]("/root/testdata/sf0.001")
    # counters only (gauges are wall-clock-shaped and excluded)
    assert set(df.columns) == {"metric", "value"}
    fams = set(df["metric"])
    assert PUT_ROWS in fams and ACK_ROWS in fams
    assert not any("delay" in m or "clock" in m for m in fams)
    assert (df["value"] >= 0).all()
