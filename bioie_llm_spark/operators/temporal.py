"""Temporal joins Spark lacks as built-ins, expressed shuffle-minimally.

As-of join (backward): for every left row, the single most recent right
row with the same key and ``right_ts <= left_ts`` (optionally within a
tolerance). The naive formulation is a non-equi join — a broadcast
nested loop or, worse, a cartesian per key. This implementation uses the
classic UNION + WINDOW technique instead (the same trick pandas
``merge_asof`` / kdb ``aj`` vendors describe for distributed engines):

    union(right-tagged rows, left-tagged rows)
    last(right payload, ignorenulls) OVER (PARTITION BY key
                                           ORDER BY ts, tag, tiebreak)
    keep left-tagged rows

One shuffle on the key, one sort within partitions, ZERO non-equi joins;
the plan survives a 100 TB right side because nothing ever pairs rows
beyond the single carried struct per partition position. Ties at equal
timestamps resolve deterministically: right rows sort BEFORE the left
row at the same instant (tag order, so an exactly-simultaneous quote IS
visible, matching ``ts <= t``), and among simultaneous right rows the
largest tiebreak column wins.

Range join: every (left, right) pair with the same key whose right value
falls inside the left row's [lo, hi] interval. The naive form is again
non-equi. Bucketing by a fixed width turns it into an equi-join on
(key, bucket): each right row lands in exactly one bucket, each left
interval explodes to the few buckets it overlaps (`sequence`), the
equi-join co-locates candidates, and the exact BETWEEN filter runs
map-side after the join. Shuffle volume is |left| * ceil(span/width) +
|right| — linear, never quadratic; AQE handles bucket skew.

No counterpart in the reference engine (row loops over in-memory dicts,
e.g. string_processor.py:168's pair list) — this is engine extension
surface for event-log-shaped corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join_bucketed"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
    tolerance_us: int | None = None,
    direction: str = "backward",
    suffix: str = "asof_",
) -> DataFrame:
    """As-of join: left columns + ``<suffix><payload>`` columns from the
    matching right row per key, NULL when none qualifies (or the match is
    further than ``tolerance_us`` microseconds away).

    ``direction`` (pandas ``merge_asof`` semantics):
    - ``backward`` — latest right row at-or-before the left timestamp;
    - ``forward``  — earliest right row at-or-after it (the same one-pass
      carry, run over the reversed ordering);
    - ``nearest``  — whichever of the two is closer in time (backward
      wins exact-distance ties, as in pandas); costs two window passes
      over the same partitioning — Spark reuses the shuffle.

    ``tiebreak`` (default: first payload column, must cast to long)
    deterministically picks among right rows sharing (key, right_ts):
    the largest value wins for backward, the smallest for forward.
    """
    if direction == "nearest":
        back = asof_join(
            left, right, key, left_ts, right_ts, payload_cols,
            tiebreak, tolerance_us, "backward", "__b_",
        )
        fwd = asof_join(
            back, right, key, left_ts, right_ts, payload_cols,
            tiebreak, tolerance_us, "forward", "__f_",
        )
        b_lag, f_lag = F.col("__b_lag_us"), F.col("__f_lag_us")
        pick_b = b_lag.isNotNull() & (f_lag.isNull() | (b_lag <= f_lag))
        out_cols = [F.col(c) for c in left.columns]
        for c in payload_cols:
            out_cols.append(
                F.when(pick_b, F.col(f"__b_{c}"))
                .otherwise(F.col(f"__f_{c}"))
                .alias(f"{suffix}{c}")
            )
        out_cols.append(
            F.when(pick_b, b_lag).otherwise(f_lag).alias(f"{suffix}lag_us")
        )
        return fwd.select(*out_cols)
    assert direction in ("backward", "forward"), direction
    fwd = direction == "forward"
    tiebreak = tiebreak or payload_cols[0]
    # Microsecond epoch, not seconds: second-truncation would silently
    # include a right row up to 1s past the boundary.
    ts = F.unix_micros(F.col("__ts").cast("timestamp"))

    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.col(tiebreak).cast("long").alias("__tie"),
        F.struct(
            F.unix_micros(F.col(right_ts).cast("timestamp")).alias("__rts"),
            *[F.col(c) for c in payload_cols],
        ).alias("__payload"),
    )
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast("long").alias("__tie"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    merged = r.withColumn("__left", F.lit(None).cast(l.schema["__left"].dataType)).unionByName(
        l
    )

    # Backward: ascending scan; right rows sort before the left row at the
    # same instant (tag 0 < 1), so ts <= t inclusive, and among
    # simultaneous right rows the largest tiebreak is carried last and
    # wins. Forward: the exact mirror — descending scan, smallest
    # tiebreak wins.
    if fwd:
        order = [ts.desc(), F.col("__tag").asc(), F.col("__tie").desc()]
    else:
        order = [ts.asc(), F.col("__tag").asc(), F.col("__tie").asc()]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))

    out = carried.filter(F.col("__tag") == 1)
    lag_expr = (F.col("__match.__rts") - ts) if fwd else (ts - F.col("__match.__rts"))
    if tolerance_us is not None:
        out = out.withColumn(
            "__match",
            F.when(lag_expr <= F.lit(tolerance_us), F.col("__match")),
        )
    lag = lag_expr.alias(f"{suffix}lag_us")
    return out.select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(f"{suffix}{c}") for c in payload_cols],
        lag,
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lo: str,
    hi: str,
    right_val: str,
    bucket_width_s: int,
) -> DataFrame:
    """Equi-join plan for ``l.lo <= r.val <= l.hi`` (same key): both sides
    map to fixed-width buckets of the long-castable value column — the
    right row to exactly one, the left interval to every bucket it
    overlaps — then join on (key, bucket) and apply the exact BETWEEN
    filter. Returns all left columns + all right columns.

    ``bucket_width_s`` is in seconds (comparison itself happens at
    microsecond precision). Pick it near the typical interval span: each
    left row then explodes to ~2 buckets and shuffle volume stays linear.
    """

    width_us = bucket_width_s * 1_000_000

    def b(col: Column) -> Column:
        return F.floor(F.unix_micros(col.cast("timestamp")) / F.lit(width_us))

    r = right.withColumn("__bucket", b(F.col(right_val)))
    l = left.withColumn(
        "__bucket", F.explode(F.sequence(b(F.col(lo)), b(F.col(hi))))
    )
    rv = F.unix_micros(F.col(right_val).cast("timestamp"))
    pair = l.join(r, [key, "__bucket"]).filter(
        rv.between(
            F.unix_micros(F.col(lo).cast("timestamp")),
            F.unix_micros(F.col(hi).cast("timestamp")),
        )
    )
    return pair.drop("__bucket")
