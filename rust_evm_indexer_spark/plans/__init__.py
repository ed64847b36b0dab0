from .inspect import (  # noqa: F401
    assert_broadcast_join,
    assert_pushed_filter,
    assert_takes_ordered_topk,
    broadcast_hint_count,
    partition_filters,
    physical_plan,
    pushed_filters,
    read_schema_columns,
)
