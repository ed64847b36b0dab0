"""Salted two-phase top-k (operators/skew.py): exactness vs the
one-phase window, salt-width invariance, the parallel plan shape — and
the documented claims that Spark already two-phases countDistinct and
map-side-combines plain aggregates (so those need no hand salting)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from conftest import SF_SMOKE
from rust_evm_indexer_spark.operators.skew import salted_topk_per_group


def _events(spark):
    return spark.read.parquet(str(SF_SMOKE / "events.parquet")).select(
        "event_type", "event_id", "value"
    )


def _plain_topk(ev, k):
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return ev.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


def test_salted_topk_matches_one_phase_window(spark):
    ev = _events(spark)
    got = sorted(
        salted_topk_per_group(
            ev, ["event_type"], [F.desc("value"), F.asc("event_id")], 5
        ).collect()
    )
    want = sorted(_plain_topk(ev, 5).collect())
    assert got == want and len(got) == 25  # 5 types x top-5


@pytest.mark.parametrize("n_salt", [1, 3, 64])
def test_salt_width_never_changes_the_answer(spark, n_salt):
    ev = _events(spark).limit(500)
    base = salted_topk_per_group(
        ev, ["event_type"], [F.desc("value"), F.asc("event_id")], 3
    )
    alt = salted_topk_per_group(
        ev, ["event_type"], [F.desc("value"), F.asc("event_id")], 3, n_salt=n_salt
    )
    assert sorted(base.collect()) == sorted(alt.collect())


def test_k_larger_than_group_returns_whole_group_ranked(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 5.0)], "k string, id int, v double"
    )
    rows = sorted(
        salted_topk_per_group(df, ["k"], [F.desc("v"), F.asc("id")], 10).collect()
    )
    assert [(r["k"], r["id"], r["rnk"]) for r in rows] == [
        ("a", 1, 2),
        ("a", 2, 1),
        ("b", 3, 1),
    ]


def test_phase1_windows_by_salt_phase2_by_key_alone(spark):
    ev = _events(spark)
    out = salted_topk_per_group(
        ev, ["event_type"], [F.desc("value"), F.asc("event_id")], 5
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_salt" not in out.columns
    # the data-scale exchange must hash on (key, salt) — the whole point;
    # Catalyst may inline the salt alias as _groupingexpression
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any(
        "event_type" in p and ("_salt" in p or "_groupingexpression" in p)
        for p in parts
    ), parts
    # and a second, key-only window stage must exist for the final rank
    assert any(
        "event_type" in p and "_salt" not in p and "_groupingexpression" not in p
        for p in parts
    ), parts


def test_spark_already_two_phases_count_distinct(spark):
    """Documents WHY skew.py has no salted countDistinct: the planner's
    distinct rewrite already shuffles on (key, value) — the hot key is
    spread by the value — so hand-salting would duplicate the plan."""
    ev = _events(spark)
    plan = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("event_id").alias("n"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("event_type" in p and "event_id" in p for p in parts), parts


def test_spark_already_partial_aggregates_plain_sums(spark):
    """Documents the other non-hole: map-side combine means a hot-key
    groupBy sum shuffles partial states, not rows."""
    ev = _events(spark)
    plan = (
        ev.groupBy("event_type")
        .agg(F.sum("value").alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_sum" in plan
