"""As-of join and interval join: semantics vs hand-computed expectations and
vs a DuckDB ASOF JOIN oracle (independent native implementation)."""

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from valor_spark.operators import temporal as TP


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def streams(spark):
    trades = spark.createDataFrame(
        [
            (1, _ts(1, 0), "t1"),
            (1, _ts(2, 0), "t2"),
            (1, _ts(0, 10), "t0"),   # before any quote
            (2, _ts(1, 30), "t3"),
            (3, _ts(5, 0), "t4"),    # key with no quotes at all
        ],
        "k bigint, ts timestamp, trade string",
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts(0, 30), 5.0),
            (1, _ts(1, 0), 6.0),     # equal-ts: inclusive match for t1
            (1, _ts(1, 30), 7.0),
            (2, _ts(1, 0), 9.0),
        ],
        "k bigint, ts timestamp, quote double",
    )
    return trades, quotes


def test_asof_join_backward_semantics(streams):
    trades, quotes = streams
    out = {
        r["trade"]: (r["ts_right"], r["quote_right"])
        for r in TP.asof_join(trades, quotes, on="k").collect()
    }
    assert out["t0"] == (None, None)          # nothing at or before
    assert out["t1"] == (_ts(1, 0), 6.0)      # inclusive equal-ts match
    assert out["t2"] == (_ts(1, 30), 7.0)     # latest <=
    assert out["t3"] == (_ts(1, 0), 9.0)      # per-key isolation
    assert out["t4"] == (None, None)          # key with no right rows


def test_asof_join_tolerance(streams):
    trades, quotes = streams
    out = {
        r["trade"]: r["quote_right"]
        for r in TP.asof_join(trades, quotes, on="k", tolerance_s=1800).collect()
    }
    assert out["t1"] == 6.0                   # 0s old -> inside
    assert out["t2"] == 7.0                   # exactly 1800s -> inclusive
    assert out["t3"] == 9.0                   # exactly 1800s -> inclusive
    tight = {
        r["trade"]: r["quote_right"]
        for r in TP.asof_join(trades, quotes, on="k", tolerance_s=1799).collect()
    }
    assert tight["t1"] == 6.0                 # still fresh
    assert tight["t2"] is None                # 1800s > 1799 -> dropped
    assert tight["t3"] is None


def test_asof_join_matches_duckdb_asof(spark):
    # random-ish deterministic streams, cross-engine equality
    trades = spark.createDataFrame(
        [(i % 5, _ts(i % 23, (i * 7) % 60), i) for i in range(200)],
        "k bigint, ts timestamp, tid bigint",
    )
    quotes = spark.createDataFrame(
        [(i % 5, _ts(i % 19, (i * 11) % 60), float(i)) for i in range(150)],
        "k bigint, ts timestamp, q double",
    ).dropDuplicates(["k", "ts"])
    got = {
        (r["tid"]): (r["ts_right"], r["q_right"])
        for r in TP.asof_join(trades, quotes, on="k").collect()
    }

    con = duckdb.connect()
    con.register("trades", trades.toPandas())
    con.register("quotes", quotes.toPandas())
    exp = {
        t: (ts, q)
        for t, ts, q in con.execute(
            """
            SELECT tr.tid, q.ts, q.q
            FROM trades tr ASOF LEFT JOIN quotes q
              ON tr.k = q.k AND tr.ts >= q.ts
            """
        ).fetchall()
    }
    assert got == exp


def test_interval_join(spark):
    points = spark.createDataFrame(
        [(i, _ts(i % 12, (i * 13) % 60)) for i in range(100)],
        "pid bigint, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, _ts(1, 0), _ts(3, 0)),
            (101, _ts(2, 30), _ts(2, 45)),    # sub-bucket interval
            (102, _ts(10, 0), _ts(23, 0)),    # many-bucket interval
            (103, _ts(22, 0), _ts(23, 0)),    # interval with no points
        ],
        "iid bigint, lo timestamp, hi timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in TP.interval_join(points, intervals, bucket_width_s=3600).collect()
    }
    pts = {i: _ts(i % 12, (i * 13) % 60) for i in range(100)}
    ivs = {100: (_ts(1), _ts(3)), 101: (_ts(2, 30), _ts(2, 45)),
           102: (_ts(10), _ts(23)), 103: (_ts(22), _ts(23))}
    exp = {
        (p, i)
        for p, t in pts.items()
        for i, (lo, hi) in ivs.items()
        if lo <= t < hi
    }
    assert got == exp
    assert not any(i == 103 for _, i in got)


def test_interval_join_fractional_second_hi_at_bucket_boundary(spark):
    # regression (round-4 ADVICE): hi = 02:00:00.5 truncates to a bucket-
    # boundary multiple; the old last-slot formula floor((trunc(hi)-1)/w)
    # dropped the final slot, losing every point in [02:00:00, 02:00:00.5)
    points = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 2, 0, 0, 200000)),   # inside [trunc(hi), hi)
            (2, dt.datetime(2024, 1, 1, 2, 0, 0, 700000)),   # past hi -> excluded
            (3, dt.datetime(2024, 1, 1, 1, 59, 59, 900000)),  # inside, prior slot
        ],
        "pid bigint, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(9, dt.datetime(2024, 1, 1, 1, 0), dt.datetime(2024, 1, 1, 2, 0, 0, 500000))],
        "iid bigint, lo timestamp, hi timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in TP.interval_join(points, intervals, bucket_width_s=3600).collect()
    }
    assert got == {(1, 9), (3, 9)}


def test_asof_join_tolerance_subsecond_precision(spark):
    # regression (round-4 ADVICE): a true 1800.9s gap must FAIL a 1800s
    # tolerance — truncated-second math accepted it (1800 <= 1800)
    trades = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 1, 30, 0, 900000), "t")],
        "k bigint, ts timestamp, trade string",
    )
    quotes = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 1, 0, 0), 5.0)],
        "k bigint, ts timestamp, quote double",
    )
    out = {
        r["trade"]: r["quote_right"]
        for r in TP.asof_join(trades, quotes, on="k", tolerance_s=1800).collect()
    }
    assert out["t"] is None
    loose = {
        r["trade"]: r["quote_right"]
        for r in TP.asof_join(trades, quotes, on="k", tolerance_s=1801).collect()
    }
    assert loose["t"] == 5.0


def test_interval_join_auto_bucket_width(spark):
    """Default (bucket_width_s=None) derives the width from a p75-span
    pre-aggregate: results are IDENTICAL to any explicit width (containment
    refine makes them width-independent), zero-span p75 clamps to 1 s, and
    an empty intervals side falls back without error."""
    points = spark.createDataFrame(
        [(i, _ts(i % 12, (i * 13) % 60)) for i in range(100)],
        "pid bigint, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, _ts(1, 0), _ts(3, 0)),
            (101, _ts(2, 30), _ts(2, 45)),
            (102, _ts(10, 0), _ts(23, 0)),
        ],
        "iid bigint, lo timestamp, hi timestamp",
    )
    auto = {(r["pid"], r["iid"]) for r in TP.interval_join(points, intervals).collect()}
    explicit = {
        (r["pid"], r["iid"])
        for r in TP.interval_join(points, intervals, bucket_width_s=3600).collect()
    }
    assert auto == explicit and auto
    # all-zero spans: p75 = 0 must clamp to width 1 s, not divide-by-zero
    degen = spark.createDataFrame(
        [(1, _ts(5, 30), _ts(5, 30))], "iid bigint, lo timestamp, hi timestamp"
    )
    assert TP.interval_join(points, degen).count() == 0  # empty half-open
    # empty intervals side: percentile returns NULL -> fallback width
    empty = degen.filter("iid < 0")
    assert TP.interval_join(points, empty).count() == 0


def test_interval_join_no_duplicate_pairs(spark):
    # an interval spanning many buckets must still yield each pair once
    points = spark.createDataFrame([(1, _ts(5, 30))], "pid bigint, ts timestamp")
    intervals = spark.createDataFrame(
        [(9, _ts(0, 0), _ts(23, 0))], "iid bigint, lo timestamp, hi timestamp"
    )
    rows = TP.interval_join(points, intervals, bucket_width_s=600).collect()
    assert len(rows) == 1
