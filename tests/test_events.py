"""Sessionization, as-of join, decontamination, top-ngrams, and
nearest-centroid assignment."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from facolos_data_pipelines_spark.operators.events import (
    asof_join,
    session_stats,
    sessionize,
)
from facolos_data_pipelines_spark.operators.similarity import assign_nearest_centroid
from facolos_data_pipelines_spark.operators.text import decontaminate, top_ngrams


def _ts(minute, second=0):
    return datetime(2024, 1, 1, 12, minute, second)


@pytest.fixture()
def tiny_events(spark):
    rows = [
        # user 1: two sessions split by a 45-min gap
        (1, 1, _ts(0), 1.0),
        (2, 1, _ts(10), 2.0),
        (3, 1, _ts(55), 4.0),
        # user 2: single event
        (4, 2, _ts(5), 8.0),
        # user 3: event exactly at the 30-min boundary stays in-session
        (5, 3, _ts(0), 16.0),
        (6, 3, _ts(30), 32.0),
    ]
    return spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])


def test_sessionize_splits_on_gap(tiny_events):
    out = sessionize(tiny_events, "user_id", "ts", 30, ["event_id"])
    got = {r["event_id"]: r["session_idx"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1, 6: 1}


def test_session_stats_rollup(tiny_events):
    out = session_stats(tiny_events, "user_id", "ts", 30, tiebreak_cols=["event_id"])
    rows = {(r["user_id"], r["session_idx"]): r for r in out.collect()}
    assert len(rows) == 4
    s11 = rows[(1, 1)]
    assert s11["n_events"] == 2
    assert s11["duration_ms"] == 10 * 60 * 1000
    assert s11["total_value"] == 3.0
    assert rows[(1, 2)]["n_events"] == 1
    # boundary event (exactly gap minutes later) belongs to the session
    assert rows[(3, 1)]["n_events"] == 2


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(10), "p"), (2, 10, _ts(20), "p"), (3, 11, _ts(5), "p")],
        ["event_id", "user_id", "ts", "kind"],
    )
    right = spark.createDataFrame(
        [
            (101, 10, _ts(10)),  # same instant as left #1 -> inclusive match
            (102, 10, _ts(15)),
            (103, 11, _ts(7)),  # after left #3 -> no match
        ],
        ["r_id", "user_id", "ts"],
    )
    out = asof_join(left, right, "user_id", "ts", ["r_id"], suffix="_m")
    got = {r["event_id"]: (r["r_id_m"], r["ts_m"]) for r in out.collect()}
    assert got[1] == (101, _ts(10))  # at-or-before is inclusive
    assert got[2] == (102, _ts(15))  # latest prior wins, not the first
    assert got[3] == (None, None)  # no prior right row -> NULLs
    assert out.count() == left.count()  # left rows always preserved


def test_asof_join_tie_break_on_right(spark):
    left = spark.createDataFrame([(1, 7, _ts(10))], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(
        [(201, 7, _ts(5)), (202, 7, _ts(5))], ["r_id", "user_id", "ts"]
    )
    out = asof_join(
        left, right, "user_id", "ts", ["r_id"], suffix="_m", right_tiebreak="r_id"
    )
    assert out.collect()[0]["r_id_m"] == 202  # greatest tie-break wins


def test_decontaminate_counts_shared_shingles(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),  # shares "alpha beta gamma" + "beta gamma delta"
            (2, "zeta eta theta iota"),  # no overlap
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=3).collect()}
    assert out[1]["n_overlap"] == 2 and out[1]["contaminated"]
    assert out[2]["n_overlap"] == 0 and not out[2]["contaminated"]


def test_top_ngrams_orders_and_ties(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c d")], ["doc_id", "text"]
    )
    rows = top_ngrams(docs, n=2, k=3).collect()
    # "a b" occurs 3x (twice in doc 1, once in doc 2); ties then by gram
    assert [(r["ngram"], r["n_occurrences"]) for r in rows] == [
        ("a b", 3),
        ("b a", 1),
        ("b c", 1),
    ]


def test_assign_nearest_centroid(spark):
    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),
            (1, [10.0, 10.0]),
            (2, [1.0, 0.0]),
            (3, [9.0, 10.0]),
            (4, [5.0, 5.0]),  # equidistant -> lowest cluster_id wins
        ],
        ["vec_id", "embedding"],
    )
    cents = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cluster_id"), F.col("embedding").alias("centroid")
    )
    out = {r["vec_id"]: r for r in assign_nearest_centroid(emb, cents).collect()}
    assert out[2]["cluster_id"] == 0 and out[2]["sq_dist"] == 1.0
    assert out[3]["cluster_id"] == 1 and out[3]["sq_dist"] == 1.0
    assert out[4]["cluster_id"] == 0  # tie broken toward the lower id
    assert out[0]["sq_dist"] == 0.0 and out[1]["sq_dist"] == 0.0


def test_filter_by_score_quantile_exact_and_approx(spark):
    from facolos_data_pipelines_spark.operators.sampling import (
        filter_by_score_quantile,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], ["id", "score"]
    )
    exact = filter_by_score_quantile(df, "score", q=0.75, approx=False)
    # 75th percentile of 1..100 (interpolated) = 75.25 -> keep 76..100
    assert exact.count() == 25
    assert exact.agg(F.min("score")).first()[0] == 76.0
    approx = filter_by_score_quantile(df, "score", q=0.75, approx=True)
    # sketch threshold lands on an observed value near the exact one
    assert 20 <= approx.count() <= 30
    with pytest.raises(ValueError):
        filter_by_score_quantile(df, "score", q=1.5)


def test_sliding_window_membership(spark):
    """Every event lands in exactly windowDuration/slide sliding
    windows, and each window's count equals the events it covers."""
    rows = [
        (1, _ts(0), 1, "click", 1.0),
        (2, _ts(29), 1, "click", 1.0),
        (3, _ts(31), 1, "click", 1.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    out = (
        df.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
        .collect()
    )
    got = {r["ws"]: r["n"] for r in out}
    # events at 12:00/12:29 covered by [11:30,12:30) and [12:00,13:00);
    # 12:31 by [12:00,13:00) and [12:30,13:30)
    assert sum(got.values()) == 6  # 3 events x 2 windows each
    assert got[datetime(2024, 1, 1, 11, 30)] == 2
    assert got[datetime(2024, 1, 1, 12, 0)] == 3
    assert got[datetime(2024, 1, 1, 12, 30)] == 1


def test_funnel_counts_ordering(spark):
    rows = [
        # user 1 completes view -> click -> purchase in order
        (1, 1, _ts(0), "view"),
        (2, 1, _ts(1), "click"),
        (3, 1, _ts(2), "purchase"),
        # user 2: purchase BEFORE view/click -> only first step counts
        (4, 2, _ts(0), "purchase"),
        (5, 2, _ts(1), "view"),
        # user 3: view then purchase, no click -> stops at step 1
        (6, 3, _ts(0), "view"),
        (7, 3, _ts(1), "purchase"),
        # user 4: never starts
        (8, 4, _ts(0), "click"),
    ]
    from facolos_data_pipelines_spark.operators.events import funnel_counts

    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = {
        r["step"]: r["n_completed"]
        for r in funnel_counts(
            df, ["view", "click", "purchase"], tiebreak_cols=["event_id"]
        ).collect()
    }
    assert out == {"view": 3, "click": 1, "purchase": 1}
    with pytest.raises(ValueError):
        funnel_counts(df, [])


def test_cohort_retention_periods(spark):
    from facolos_data_pipelines_spark.operators.events import cohort_retention

    rows = [
        # user 1 first active Mon Jan 1 week, returns 2 weeks later
        (1, datetime(2024, 1, 2, 10)),
        (1, datetime(2024, 1, 16, 10)),
        # user 2 same cohort, active only week 0 (two events, one week)
        (2, datetime(2024, 1, 3, 9)),
        (2, datetime(2024, 1, 4, 9)),
        # user 3 joins a week later
        (3, datetime(2024, 1, 9, 12)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (r["cohort_week"].date().isoformat(), r["period_weeks"]): r["n_active"]
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


# ---------------------------------------------------------------------------
# Property-based: sessionize and asof_join against a pure-Python reference
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

EVENT_LISTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user_id
        st.integers(min_value=0, max_value=5000),  # seconds offset
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=15, deadline=None)
@given(EVENT_LISTS)
def test_sessionize_matches_python_reference(spark, events):
    from datetime import timedelta

    gap_min = 10
    rows = [
        (i, u, datetime(2024, 1, 1) + timedelta(seconds=s))
        for i, (u, s) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    got = {
        r["event_id"]: (r["user_id"], r["session_idx"])
        for r in sessionize(df, "user_id", "ts", gap_min, ["event_id"]).collect()
    }
    # python reference: sort per user by (ts, event_id), split on gap
    want = {}
    by_user = {}
    for i, (u, s) in enumerate(events):
        by_user.setdefault(u, []).append((s, i))
    for u, evs in by_user.items():
        evs.sort()
        idx, prev = 0, None
        for s, i in evs:
            if prev is None or s - prev > gap_min * 60:
                idx += 1
            want[i] = (u, idx)
            prev = s
    assert got == want


@settings(max_examples=15, deadline=None)
@given(EVENT_LISTS, EVENT_LISTS)
def test_asof_join_matches_python_reference(spark, levs, revs):
    from datetime import timedelta

    base = datetime(2024, 1, 1)
    lrows = [
        (i, u, base + timedelta(seconds=s)) for i, (u, s) in enumerate(levs)
    ]
    rrows = [
        (i, u, base + timedelta(seconds=s)) for i, (u, s) in enumerate(revs)
    ]
    left = spark.createDataFrame(lrows, ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(rrows, ["r_id", "user_id", "ts"])
    out = asof_join(
        left, right, "user_id", "ts", ["r_id"], suffix="_m", right_tiebreak="r_id"
    )
    got = {r["event_id"]: r["r_id_m"] for r in out.collect()}
    # python reference: greatest (ts, r_id) with r.ts <= l.ts, same user
    want = {}
    for i, (u, s) in enumerate(levs):
        best = None
        for j, (ru, rs) in enumerate(revs):
            if ru == u and rs <= s and (best is None or (rs, j) > best):
                best = (rs, j)
        want[i] = None if best is None else best[1]
    assert got == want


def test_asof_join_forward(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(10)), (2, 10, _ts(30)), (3, 11, _ts(5))],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (101, 10, _ts(10)),  # same instant -> inclusive forward match
            (102, 10, _ts(15)),
            (103, 11, _ts(3)),  # before left #3 -> no forward match
        ],
        ["r_id", "user_id", "ts"],
    )
    out = asof_join(
        left, right, "user_id", "ts", ["r_id"], suffix="_m", direction="forward"
    )
    got = {r["event_id"]: (r["r_id_m"], r["ts_m"]) for r in out.collect()}
    assert got[1] == (101, _ts(10))  # inclusive at equal ts
    assert got[2] == (None, None)  # nothing at-or-after 12:30
    assert got[3] == (None, None)
    with pytest.raises(ValueError):
        asof_join(left, right, "user_id", "ts", ["r_id"], direction="nearest")


@settings(max_examples=15, deadline=None)
@given(EVENT_LISTS, EVENT_LISTS)
def test_asof_join_forward_matches_python_reference(spark, levs, revs):
    from datetime import timedelta

    base = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, u, base + timedelta(seconds=s)) for i, (u, s) in enumerate(levs)],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [(i, u, base + timedelta(seconds=s)) for i, (u, s) in enumerate(revs)],
        ["r_id", "user_id", "ts"],
    )
    out = asof_join(
        left, right, "user_id", "ts", ["r_id"], suffix="_m",
        right_tiebreak="r_id", direction="forward",
    )
    got = {r["event_id"]: r["r_id_m"] for r in out.collect()}
    # reference: smallest (ts, r_id) with r.ts >= l.ts, same user
    want = {}
    for i, (u, s) in enumerate(levs):
        best = None
        for j, (ru, rs) in enumerate(revs):
            if ru == u and rs >= s and (best is None or (rs, j) < best):
                best = (rs, j)
        want[i] = None if best is None else best[1]
    assert got == want


def test_asof_join_null_timestamps_never_match(spark):
    """NULL-ts right rows are not phantom matches (asc sort would put
    them first) and NULL-ts left rows match nothing — SQL comparison
    semantics, same as a native ASOF join."""
    left = spark.createDataFrame(
        [(1, 5, _ts(10)), (2, 5, None)], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [(900, 5, None), (901, 5, _ts(4))], ["r_id", "user_id", "ts"]
    )
    for direction in ("backward", "forward"):
        out = asof_join(
            left, right, "user_id", "ts", ["r_id"], suffix="_m",
            direction=direction,
        )
        got = {r["event_id"]: r["r_id_m"] for r in out.collect()}
        assert got[2] is None, direction  # null left ts -> no match
        if direction == "backward":
            assert got[1] == 901  # real prior row, not the null-ts one
        else:
            assert got[1] is None  # nothing at-or-after 12:10


def test_time_decayed_sum_known_weights(spark):
    """Exact half-life checkpoints: an event AT the reference weighs 1,
    one exactly one half-life older weighs 0.5; raw sum, counts and
    last_ts come from the same aggregate."""
    from facolos_data_pipelines_spark.operators.events import time_decayed_sum

    rows = [
        (1, datetime(2024, 1, 3, 0, 0, 0), 10.0),
        (1, datetime(2024, 1, 1, 0, 0, 0), 4.0),  # 2 days = 1 half-life
        (2, datetime(2024, 1, 3, 0, 0, 0), 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        r["user_id"]: r.asDict()
        for r in time_decayed_sum(
            df, "user_id", "ts", "value", half_life_days=2.0
        ).collect()
    }
    assert got[1]["decayed_value"] == 12.0  # 10*1 + 4*0.5
    assert got[1]["raw_value"] == 14.0
    assert got[1]["n_events"] == 2
    assert got[1]["last_ts"] == datetime(2024, 1, 3)
    assert got[2]["decayed_value"] == 7.0  # at ref -> weight exactly 1

    # explicit ref_ts: one more half-life in the past halves everything
    got5 = {
        r["user_id"]: r["decayed_value"]
        for r in time_decayed_sum(
            df, "user_id", "ts", "value", half_life_days=2.0,
            ref_ts="2024-01-05 00:00:00",
        ).collect()
    }
    assert got5[1] == 6.0 and got5[2] == 3.5


def test_time_decayed_sum_incremental_rescale(spark):
    """The associativity contract the docstring promises: a stored
    total from t0 rescaled by 0.5**((t1-t0)/h) plus the new batch's
    decayed sum at t1 equals the from-scratch recompute at t1."""
    from facolos_data_pipelines_spark.operators.events import time_decayed_sum

    old = [(1, datetime(2024, 1, 1), 8.0), (1, datetime(2024, 1, 2), 6.0)]
    new = [(1, datetime(2024, 1, 5), 2.0)]
    schema = "user_id long, ts timestamp, value double"
    h = 2.0
    t0, t1 = "2024-01-03 00:00:00", "2024-01-05 00:00:00"
    at_t0 = time_decayed_sum(
        spark.createDataFrame(old, schema), "user_id", "ts", "value",
        half_life_days=h, ref_ts=t0, round_digits=9,
    ).first()["decayed_value"]
    batch_at_t1 = time_decayed_sum(
        spark.createDataFrame(new, schema), "user_id", "ts", "value",
        half_life_days=h, ref_ts=t1, round_digits=9,
    ).first()["decayed_value"]
    scratch = time_decayed_sum(
        spark.createDataFrame(old + new, schema), "user_id", "ts", "value",
        half_life_days=h, ref_ts=t1, round_digits=9,
    ).first()["decayed_value"]
    rescaled = at_t0 * 0.5 ** (2.0 / h) + batch_at_t1
    assert abs(rescaled - scratch) < 1e-6
