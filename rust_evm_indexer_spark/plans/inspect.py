"""Physical-plan inspection helpers.

"Would this survive a 100× scale-up?" is a property of the *physical
plan*, not the result — these helpers make plan shape testable: filters
reaching the parquet scan (file/row-group skipping), column pruning
(ReadSchema), broadcast vs shuffle joins, top-k vs global sort.  Used by
``tests/test_plan_hygiene.py`` so a regression that silently un-pushes a
predicate or flips a broadcast join to sort-merge fails CI, not the
cluster bill.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """All PartitionFilters entries across the plan's scans — non-empty
    iff the scan prunes whole partition directories (the IVF probe
    contract: only the probed cells' files are ever listed)."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Union of columns the scans actually read (column-pruning check)."""
    plan = physical_plan(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def assert_pushed_filter(df: DataFrame, column: str) -> None:
    filters = pushed_filters(df)
    assert any(column in f for f in filters), (
        f"no pushed filter on {column!r}; PushedFilters={filters}\n"
        f"{physical_plan(df)}"
    )


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of EXPLICIT broadcast hints surviving into the optimized
    logical plan (``rightHint=(strategy=broadcast)``).  Size-based
    broadcasts picked by the planner/AQE do NOT count — this isolates
    what the query author *forced*, which is exactly the scale hazard:
    a hint on a table that grows with the data OOMs executors at 100×
    regardless of how fast it runs at test SF."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return plan.count("strategy=broadcast")


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, f"expected ≥{at_least} BroadcastHashJoin, got {n}\n{plan}"


def assert_takes_ordered_topk(df: DataFrame) -> None:
    """LIMIT-after-ORDER must plan as distributed top-k, not global sort."""
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, f"no TakeOrderedAndProject\n{plan}"
