"""Hostile-timezone matrix (VERDICT r3 item 8): every tz-sensitive
catalog entry must match its DuckDB oracle even when the ambient Spark
session timezone is America/New_York at call time.

This makes the manual probe (`tools/drive_driver_contract.py
America/New_York`, commit e296ee8) permanent CI.  The defense under test
is layered: ``load_driver_table`` re-pins UTC because the driver owns the
session (sources/batch.py:38), ``ts_micros`` asserts its LTZ
precondition (functions/timeutil.py), and ``reorg_rollup_exact``
pins-and-restores around its fixture build.  A new entry that parses a
timestamp literal or truncates calendar buckets under the ambient tz
breaks here before it breaks under the driver.
"""

from __future__ import annotations

import inspect

import pytest

from rust_evm_indexer_spark.catalog import CATALOG

from compare import assert_frames_match
from conftest import SF_ORACLE

HOSTILE_TZ = "America/New_York"  # DST-shifting, -4/-5h: worst common case

# Curated probe list: every entry whose plan touches session-tz-sensitive
# constructs (ts_micros, timestamp literals, calendar truncation, window
# bucketing).  The guard test below keeps this list honest against the
# ts_micros call graph; streaming/sliding entries are included explicitly
# because their epoch-aligned window arithmetic is the classic tz bug.
_HOSTILE_TZ_ENTRIES = sorted(
    {
        # ts_micros users (auto-guarded below)
        "asof_join_events",
        "events_gapfill_locf",
        "events_hourly_rollup",
        "funnel_conversion",
        "interval_join_events",
        "retention_cohorts",
        "logs_keyset_page",
        "logs_offset_page",
        "logs_page_first",
        "orders_monthly",
        "q14_promo_revenue",
        "q18_large_orders",
        "reorg_rollup_exact",
        "top1_latest",
        "window_lag_delta",
        # timestamp-literal / window-bucketing entries without ts_micros
        "events_sessionize",
        "events_sliding_rollup",
        "range_join_events",
        "q1_pricing_summary",
        "q4_priority_check",
        "q6_forecast_revenue",
    }
)


def test_every_ts_micros_entry_is_probed():
    """Any new entry calling ts_micros must join the hostile-tz matrix —
    the list above cannot silently fall behind the call graph."""
    need = {
        n for n, e in CATALOG.items() if "ts_micros" in inspect.getsource(e.fn)
    }
    missing = need - set(_HOSTILE_TZ_ENTRIES)
    assert not missing, f"ts_micros entries missing from hostile-tz matrix: {missing}"


@pytest.fixture()
def hostile_tz(spark):
    prior = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", HOSTILE_TZ)
    yield
    spark.conf.set("spark.sql.session.timeZone", prior)


@pytest.mark.parametrize("name", _HOSTILE_TZ_ENTRIES)
def test_entry_matches_oracle_under_hostile_tz(spark, duck, hostile_tz, name):
    entry = CATALOG[name]
    # the fixture set NY; the entry (or its table loader) is responsible
    # for pinning whatever IT needs — ambient state must not leak into
    # the result
    got = entry.fn(spark, str(SF_ORACLE))
    assert_frames_match(got, duck.execute(entry.oracle).df(), name)
