"""Temporal join operators Spark lacks natively: as-of join and interval
(range) join.

Both are implemented as compositions of built-in DataFrame ops chosen for
their 100 TB shuffle shape — never as a cross product:

* ``asof_join`` uses the UNION + windowed last-non-null trick: tag the two
  streams, union them, sort per key by time inside one window, and carry
  the latest right-side payload forward onto each left row.  Cost = ONE
  shuffle of (keys, time) — same as a sort-merge join — with zero risk of
  pair explosion, unlike the naive range-condition join whose worst case is
  |L|x|R| per key.  This is the standard scalable formulation (same shape
  as Flink's event-time temporal join).
* ``interval_join`` buckets time into fixed-width slots: a point joins on
  its single slot, an interval explodes to the slots it covers, and the
  equi-join on slot is then refined by the exact containment predicate.
  Each (point, interval) pair meets in EXACTLY one slot (the point's), so
  no dedup pass is needed.  Cost = one equi-shuffle on slot + bounded
  interval replication (span / bucket_width rows per interval); pick
  ``bucket_width`` ~ the typical interval span so replication stays O(1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_s(c: Column) -> Column:
    """Seconds since epoch (truncated), accepting TIMESTAMP and
    TIMESTAMP_NTZ alike (Spark 4 refuses a direct NTZ->long cast).  NTZ
    values are interpreted in the session time zone — set
    ``spark.sql.session.timeZone=UTC`` for engine-portable arithmetic; only
    *differences* feed the operators here, so a constant offset is harmless
    anyway."""
    return c.cast("timestamp").cast("long")


def _epoch_us(c: Column) -> Column:
    """Microseconds since epoch — FULL precision.  Truncated-second
    arithmetic silently widens tolerances / drops sub-second boundary
    matches (a true 1800.9s gap passes a 1800s tolerance when both ends are
    floored), so every comparison against user-supplied bounds uses this."""
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance_s: int | None = None,
) -> DataFrame:
    """Backward as-of join: each left row picks the LATEST right row with
    ``right_ts <= left_ts`` for the same key(s); ties on equal timestamps
    prefer the right row (inclusive match).  Right-side payload columns
    (``right_cols``, default: all non-key non-ts columns) are appended with
    ``suffix``, plus ``<right_ts><suffix>`` itself; unmatched left rows get
    NULLs (left-join semantics).  ``tolerance_s`` drops matches older than
    the given number of seconds.

    When several right rows share the same (key, timestamp) the carried row
    is the last in (timestamp, payload-struct) order — deterministic, but
    callers should de-dup right on (key, ts) if that order is not meaningful.

    NULL keys: the window formulation groups NULL keys TOGETHER (a NULL-key
    left row can match a NULL-key right row), whereas a SQL equality-join
    formulation (incl. DuckDB ASOF ``ON l.k = r.k``) never matches NULLs —
    filter NULL keys out beforehand if SQL semantics are required.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys + [right_ts]]

    pay = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        *keys, F.col(right_ts).alias("__t"), F.lit(0).alias("__is_left"), pay.alias("__rpay")
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r.schema["__rpay"].dataType).alias("__rpay"),
    )
    u = l.select(r.columns + [c for c in l.columns if c not in r.columns]).unionByName(
        r, allowMissingColumns=True
    )
    # right rows (__is_left=0) sort BEFORE left rows at equal __t -> inclusive
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__is_left", "__rpay")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__rpay", ignorenulls=True).over(w)).filter(
        F.col("__is_left") == 1
    )
    if tolerance_s is not None:
        # full-precision microsecond delta: a truncated-second comparison
        # accepts matches up to ~1s older than the stated tolerance when
        # timestamps carry sub-second parts
        in_tol = (
            _epoch_us(F.col("__t")) - _epoch_us(F.col("__m.__rts"))
        ) <= F.lit(int(tolerance_s) * 1_000_000)
        matched = matched.withColumn(
            "__m", F.when(in_tol, F.col("__m"))
        )
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("__m.__rts").alias(right_ts + suffix))
    out_cols += [F.col(f"__m.{c}").alias(c + suffix) for c in right_cols]
    return matched.select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    lo: str = "lo",
    hi: str = "hi",
    bucket_width_s: int | None = None,
) -> DataFrame:
    """Join each point to every interval containing it (``lo <= ts < hi``),
    with NO equi-key required.  Returns all point columns plus all interval
    columns.  ``bucket_width_s`` trades interval replication (span/width
    copies) against slot-join selectivity; intervals and points meet in the
    point's single slot, so results need no dedup.

    Default (``bucket_width_s=None``): the width is DERIVED from the data —
    one tiny aggregate takes the p75 of interval spans (clamped to >= 1 s)
    before planning the join, so >= 75% of intervals replicate to at most
    two slots whatever the table's time scale.  A caller-supplied constant
    silently over-replicates when spans don't match it (e.g. week-long
    intervals against the old 3600 s default = 168 copies each); results
    are width-INDEPENDENT either way (exact containment refines the slot
    join), only the shuffle volume moves."""
    if bucket_width_s is None:
        span_us = intervals.select(
            F.percentile_approx(
                _epoch_us(F.col(hi)) - _epoch_us(F.col(lo)), 0.75, 10_000
            ).alias("p75")
        ).first()["p75"]
        wsec = max(1, int((span_us or 3_600_000_000) // 1_000_000))
    else:
        wsec = int(bucket_width_s)
    p = points.withColumn(
        "__slot", F.floor(_epoch_s(F.col(point_ts)) / wsec)
    )
    # Last slot is floor(trunc(hi)/w) WITHOUT the tempting -1 "half-open"
    # adjustment: with a fractional-second hi, points in [trunc(hi), hi)
    # live in trunc(hi)'s slot, and -1 drops that slot entirely whenever
    # trunc(hi) is a bucket-boundary multiple (e.g. point 02:00:00.2 inside
    # an interval ending 02:00:00.5 at bucket=3600).  Monotonicity of
    # second-truncation gives slot(lo) <= slot(p) <= slot(hi) for every
    # contained point, and the exact containment filter below removes the
    # at-most-one extra slot's false candidates for free.
    i = intervals.withColumn(
        "__slot",
        F.explode(
            F.sequence(
                F.floor(_epoch_s(F.col(lo)) / wsec),
                F.floor(_epoch_s(F.col(hi)) / wsec),
            )
        ),
    )
    joined = p.join(i, on="__slot").filter(
        (F.col(lo) <= F.col(point_ts)) & (F.col(point_ts) < F.col(hi))
    )
    return joined.drop("__slot")
