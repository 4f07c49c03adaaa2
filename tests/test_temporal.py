"""operators/temporal: as-of join (union+window) and bucketed range join
vs brute-force python twins, including hypothesis-generated event logs
and the plan-shape guarantee (no non-equi join in either operator)."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from bioie_llm_spark.operators.temporal import asof_join, range_join_bucketed

EPOCH = dt.datetime(2024, 1, 1)


def _ts(us: int) -> dt.datetime:
    return EPOCH + dt.timedelta(microseconds=us)


def _frames(spark, left_rows, right_rows):
    lschema = StructType(
        [StructField("lid", LongType()), StructField("k", LongType()),
         StructField("lts", TimestampType())]
    )
    rschema = StructType(
        [StructField("k", LongType()), StructField("rts", TimestampType()),
         StructField("rid", LongType())]
    )
    left = spark.createDataFrame(
        [(i, k, _ts(us)) for i, (k, us) in enumerate(left_rows)], lschema
    )
    right = spark.createDataFrame(
        [(k, _ts(us), i) for i, (k, us) in enumerate(right_rows)], rschema
    )
    return left, right


def _py_asof(left_rows, right_rows, tolerance_us=None, direction="backward"):
    """Brute-force twin with pandas merge_asof direction semantics."""
    out = {}
    for i, (k, lus) in enumerate(left_rows):
        best = None
        for j, (rk, rus) in enumerate(right_rows):
            if rk != k:
                continue
            if direction == "backward":
                ok = rus <= lus and (tolerance_us is None or lus - rus <= tolerance_us)
                cand = (rus, j)  # max wins
                better = best is None or cand > best
            elif direction == "forward":
                ok = rus >= lus and (tolerance_us is None or rus - lus <= tolerance_us)
                cand = (-rus, -j)  # min rts, then min rid wins
                better = best is None or cand > best
            else:  # nearest: smaller distance wins, backward breaks ties
                ok = tolerance_us is None or abs(rus - lus) <= tolerance_us
                is_back = rus <= lus
                cand = (-abs(rus - lus), is_back,
                        (rus, j) if is_back else (-rus, -j))
                better = best is None or cand > best
            if ok and better:
                best = cand
                out[i] = j
        if i not in out:
            out[i] = None
    return out


class TestAsofJoin:
    def test_basic_backward_semantics(self, spark):
        left = [(1, 100), (1, 50), (2, 10)]
        right = [(1, 100), (1, 99), (1, 101), (2, 20)]
        l, r = _frames(spark, left, right)
        got = {
            row["lid"]: row["asof_rid"]
            for row in asof_join(l, r, "k", "lts", "rts", ["rid"]).collect()
        }
        # lid 0 at t=100: rid 0 (exactly simultaneous row IS visible);
        # lid 1 at t=50: nothing at-or-before; lid 2: nothing (k=2 at 20>10)
        assert got == {0: 0, 1: None, 2: None}

    def test_simultaneous_right_rows_tiebreak_largest(self, spark):
        l, r = _frames(spark, [(7, 500)], [(7, 500), (7, 500), (7, 400)])
        got = asof_join(l, r, "k", "lts", "rts", ["rid"]).collect()[0]
        assert got["asof_rid"] == 1  # largest rid among ties at 500
        assert got["asof_lag_us"] == 0

    def test_tolerance(self, spark):
        l, r = _frames(spark, [(1, 1_000_000)], [(1, 0)])
        no_tol = asof_join(l, r, "k", "lts", "rts", ["rid"]).collect()[0]
        assert no_tol["asof_rid"] == 0 and no_tol["asof_lag_us"] == 1_000_000
        tol = asof_join(l, r, "k", "lts", "rts", ["rid"], tolerance_us=999_999)
        assert tol.collect()[0]["asof_rid"] is None

    @settings(max_examples=15, deadline=None)
    @given(
        left=st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 2_000_000)), min_size=1, max_size=12
        ),
        right=st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 2_000_000)), min_size=0, max_size=12
        ),
    )
    def test_matches_python_twin(self, spark, left, right):
        l, r = _frames(spark, left, right)
        got = {
            row["lid"]: row["asof_rid"]
            for row in asof_join(l, r, "k", "lts", "rts", ["rid"]).collect()
        }
        assert got == _py_asof(left, right)

    @settings(max_examples=10, deadline=None)
    @given(
        left=st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 500_000)), min_size=1, max_size=8
        ),
        right=st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 500_000)), min_size=0, max_size=10
        ),
    )
    def test_forward_and_nearest_match_python_twin(self, spark, left, right):
        l, r = _frames(spark, left, right)
        for direction in ("forward", "nearest"):
            got = {
                row["lid"]: row["asof_rid"]
                for row in asof_join(
                    l, r, "k", "lts", "rts", ["rid"], direction=direction
                ).collect()
            }
            assert got == _py_asof(left, right, direction=direction), direction

    def test_nearest_backward_wins_exact_tie(self, spark):
        # right rows equidistant (±10us): pandas semantics = backward wins
        l, r = _frames(spark, [(1, 100)], [(1, 90), (1, 110)])
        row = asof_join(l, r, "k", "lts", "rts", ["rid"], direction="nearest").collect()[0]
        assert row["asof_rid"] == 0 and row["asof_lag_us"] == 10

    def test_forward_tolerance(self, spark):
        l, r = _frames(spark, [(1, 0)], [(1, 1_000_000)])
        ok = asof_join(l, r, "k", "lts", "rts", ["rid"], direction="forward",
                       tolerance_us=1_000_000).collect()[0]
        assert ok["asof_rid"] == 0
        cut = asof_join(l, r, "k", "lts", "rts", ["rid"], direction="forward",
                        tolerance_us=999_999).collect()[0]
        assert cut["asof_rid"] is None

    def test_plan_has_no_nonequi_join(self, spark):
        l, r = _frames(spark, [(1, 10)], [(1, 5)])
        plan = (
            asof_join(l, r, "k", "lts", "rts", ["rid"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "Window" in plan


class TestRangeJoinBucketed:
    @pytest.mark.parametrize("width_s", [1, 2, 10])
    def test_matches_naive_join(self, spark, width_s):
        import random

        rnd = random.Random(42)
        lrows = [(i, rnd.randint(0, 4), rnd.randint(0, 30_000_000)) for i in range(25)]
        rrows = [(rnd.randint(0, 4), rnd.randint(0, 30_000_000), i) for i in range(60)]
        lschema = StructType(
            [StructField("lid", LongType()), StructField("k", LongType()),
             StructField("c", LongType())]
        )
        left = (
            spark.createDataFrame(lrows, lschema)
            .withColumn("lo", F.timestamp_micros(F.col("c") - 3_000_000))
            .withColumn("hi", F.timestamp_micros(F.col("c") + 3_000_000))
            .drop("c")
        )
        rschema = StructType(
            [StructField("k", LongType()), StructField("v", LongType()),
             StructField("rid", LongType())]
        )
        right = spark.createDataFrame(rrows, rschema).withColumn(
            "val", F.timestamp_micros("v")
        ).drop("v")
        got = sorted(
            (row["lid"], row["rid"])
            for row in range_join_bucketed(
                left, right, key="k", lo="lo", hi="hi", right_val="val",
                bucket_width_s=width_s,
            ).collect()
        )
        want = sorted(
            (lid, rid)
            for lid, lk, c in lrows
            for rk, v, rid in rrows
            if lk == rk and c - 3_000_000 <= v <= c + 3_000_000
        )
        assert got == want

    def test_plan_is_equi_join(self, spark):
        left = spark.range(3).select(
            F.col("id").alias("k"),
            F.timestamp_micros(F.col("id") * 1000).alias("lo"),
            F.timestamp_micros(F.col("id") * 1000 + 5000).alias("hi"),
        )
        right = spark.range(3).select(
            F.col("id").alias("k"), F.timestamp_micros(F.col("id") * 2000).alias("val")
        )
        plan = (
            range_join_bucketed(left, right, "k", "lo", "hi", "val", bucket_width_s=1)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
