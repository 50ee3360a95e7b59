"""Gap-based sessionization (streaming/events.user_sessions, run in
batch mode): the empirically-pinned boundary rule (merge at
exactly-gap), session end = last ts + gap, and per-session aggregates.
The corpus-scale behavior is oracle-checked by the `user_sessions`
query; these are the semantic edges."""

import datetime as dt

from whoiswho_spark.streaming.events import user_sessions

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _sessions(spark, rows, gap="30 minutes"):
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    return sorted(
        user_sessions(df, gap=gap).collect(),
        key=lambda r: (r.user_id, r.session_start),
    )


def test_exact_gap_boundary_merges(spark):
    # Spark session windows merge when the next event lands EXACTLY at
    # prev_ts + gap (the oracle mirrors: new session iff diff > gap)
    out = _sessions(
        spark,
        [(1, T0, 1.0), (1, T0 + dt.timedelta(minutes=30), 2.0)],
    )
    assert len(out) == 1
    assert out[0].n_events == 2
    assert out[0].session_end == T0 + dt.timedelta(hours=1)


def test_over_gap_splits(spark):
    out = _sessions(
        spark,
        [(1, T0, 1.0), (1, T0 + dt.timedelta(minutes=30, seconds=1), 2.0)],
    )
    assert len(out) == 2
    assert [r.n_events for r in out] == [1, 1]
    assert out[0].session_end == T0 + dt.timedelta(minutes=30)


def test_sessions_isolated_per_user(spark):
    out = _sessions(
        spark,
        [(1, T0, 1.0), (2, T0 + dt.timedelta(minutes=1), 1.0)],
    )
    assert len(out) == 2 and {r.user_id for r in out} == {1, 2}


def test_chained_events_extend_one_session(spark):
    rows = [
        (1, T0 + dt.timedelta(minutes=29 * k), float(k)) for k in range(4)
    ]
    out = _sessions(spark, rows)
    assert len(out) == 1
    assert out[0].n_events == 4
    assert out[0].session_start == T0
    assert out[0].session_end == T0 + dt.timedelta(minutes=29 * 3 + 30)
