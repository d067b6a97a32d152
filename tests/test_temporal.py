"""asof_join (operators/temporal.py) vs a brute-force per-row oracle:
both directions, equal-ts tie (must match, SQL ASOF '>='), tolerance
nulling, left-outer no-match rows, multi-column by keys."""

import datetime as dt

import pytest

from tilers_tools_spark.operators.temporal import asof_join


def t(m):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=m)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, t(5), 1.0), (2, 10, t(10), 2.0), (3, 10, t(2), 3.0),
         (4, 20, t(7), 4.0), (5, 30, t(9), 5.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [(10, t(3), 100, 0.5), (10, t(10), 101, 0.7),   # t(10): equal-ts tie
         (20, t(8), 102, 0.9)],                          # only AFTER left t(7)
        "user_id long, ts timestamp, err_id long, err_value double",
    )
    return left, right


def _collect(out):
    return {
        r["event_id"]: (r["err_id_r"], r["ts_r"])
        for r in out.select("event_id", "err_id_r", "ts_r").collect()
    }


def test_backward(frames):
    left, right = frames
    got = _collect(asof_join(left, right, by=["user_id"]))
    assert got[1] == (100, t(3))   # t(5) -> latest err at t(3)
    assert got[2] == (101, t(10))  # equal ts MATCHES ('>=')
    assert got[3] == (None, None)  # t(2): nothing before
    assert got[4] == (None, None)  # user 20's only err is after t(7)
    assert got[5] == (None, None)  # user 30 has no errs at all
    assert len(got) == 5           # left-outer: every left row kept


def test_forward(frames):
    left, right = frames
    got = _collect(asof_join(left, right, by=["user_id"], direction="forward"))
    assert got[1] == (101, t(10))  # t(5) -> next err at t(10)
    assert got[2] == (101, t(10))  # equal ts matches forward too ('<=')
    assert got[3] == (100, t(3))
    assert got[4] == (102, t(8))
    assert got[5] == (None, None)


def test_tolerance(frames):
    left, right = frames
    got = _collect(asof_join(left, right, by=["user_id"], tolerance_s=90.0))
    assert got[1] == (None, None)  # 2 min lag > 90 s -> nulled, row kept
    assert got[2] == (101, t(10))  # 0 s lag
    assert len(got) == 5


def test_left_columns_carried(frames):
    left, right = frames
    row = {r["event_id"]: r for r in asof_join(left, right, by=["user_id"]).collect()}
    assert row[1]["value"] == 1.0 and row[1]["user_id"] == 10
    assert row[1]["ts"] == t(5)
    assert row[1]["err_value_r"] == 0.5


def test_multi_key_by(spark):
    left = spark.createDataFrame(
        [(1, 10, "a", t(5)), (2, 10, "b", t(5))],
        "event_id long, user_id long, region string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, "a", t(4), 7), (10, "b", t(1), 8)],
        "user_id long, region string, ts timestamp, err_id long",
    )
    got = _collect(asof_join(left, right, by=["user_id", "region"]))
    assert got == {1: (7, t(4)), 2: (8, t(1))}


def test_brute_force_random(spark):
    """200 left x 80 right over 7 users vs an exhaustive pandas scan."""
    import numpy as np

    rng = np.random.default_rng(7)
    lrows = [(int(i), int(rng.integers(7)), t(int(rng.integers(0, 500))))
             for i in range(200)]
    rrows = [(int(rng.integers(7)), t(int(rng.integers(0, 500))), int(1000 + j))
             for j in range(80)]
    # dedupe right on (user, ts) so the tie-break never engages
    seen, rr = set(), []
    for u, ts, rid in rrows:
        if (u, ts) not in seen:
            seen.add((u, ts))
            rr.append((u, ts, rid))
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(rr, "user_id long, ts timestamp, err_id long")
    got = _collect(asof_join(left, right, by=["user_id"]))
    for eid, u, ts in lrows:
        cand = [(rts, rid) for (ru, rts, rid) in rr if ru == u and rts <= ts]
        want = max(cand)[1] if cand else None
        assert got[eid][0] == want, (eid, u, ts)


# ---------------------------------------------------------------- interval


from tilers_tools_spark.operators.temporal import interval_join  # noqa: E402


def test_interval_hand(spark):
    """Inclusive boundaries, multi-bucket spans (no duplicate pairs),
    by-key isolation, inner semantics (non-contained rows dropped)."""
    left = spark.createDataFrame(
        [(1, 10, t(0)), (2, 10, t(30)), (3, 10, t(61)),   # span checks
         (4, 20, t(30)),                                   # other key
         (5, 10, t(200))],                                 # no interval
        "event_id long, user_id long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [(10, t(0), t(61), 100),      # crosses many 15-min buckets
         (10, t(25), t(35), 101),     # overlaps the first -> t(30) double-hit
         (20, t(30), t(30), 102)],    # zero-length, boundary == boundary
        "user_id long, iv_start timestamp, iv_end timestamp, iv_id long",
    )
    out = interval_join(left, ivs, ts_col="ts", start_col="iv_start",
                        end_col="iv_end", by=["user_id"], bucket_s=900.0)
    got = sorted((r["event_id"], r["iv_id"]) for r in out.collect())
    assert got == [(1, 100), (2, 100), (2, 101), (3, 100), (4, 102)]


def test_interval_no_dup_across_buckets(spark):
    """A pair that coexists in several buckets must appear exactly once:
    the bucketing is left-row-sided, so tiny bucket_s vs long interval
    cannot duplicate."""
    left = spark.createDataFrame([(1, t(50))], "event_id long, ts timestamp")
    ivs = spark.createDataFrame([(t(0), t(100), 7)],
                                "iv_start timestamp, iv_end timestamp, iv_id long")
    out = interval_join(left, ivs, ts_col="ts", start_col="iv_start",
                        end_col="iv_end", bucket_s=60.0)  # interval spans 100 buckets
    assert [(r["event_id"], r["iv_id"]) for r in out.collect()] == [(1, 7)]


def test_interval_brute_force(spark):
    """300 points x 40 intervals over 5 keys vs an exhaustive scan,
    with a bucket_s that does NOT divide the interval lengths."""
    import numpy as np

    rng = np.random.default_rng(11)
    pts = [(int(i), int(rng.integers(5)), t(int(rng.integers(0, 600))))
           for i in range(300)]
    ivs = []
    for j in range(40):
        s = int(rng.integers(0, 580))
        ivs.append((int(rng.integers(5)), t(s), t(s + int(rng.integers(1, 90))),
                    int(1000 + j)))
    left = spark.createDataFrame(pts, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        ivs, "user_id long, iv_start timestamp, iv_end timestamp, iv_id long")
    out = interval_join(left, right, ts_col="ts", start_col="iv_start",
                        end_col="iv_end", by=["user_id"], bucket_s=777.7)
    got = sorted((r["event_id"], r["iv_id"]) for r in out.collect())
    want = sorted(
        (eid, ivid)
        for (eid, u, ts) in pts
        for (iu, s, e, ivid) in ivs
        if iu == u and s <= ts <= e
    )
    assert got == want
