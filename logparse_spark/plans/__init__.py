"""Physical-plan assertions: the scale discipline made testable."""

from logparse_spark.plans.checks import (
    executed_plan,
    formatted_plan,
    assert_broadcast_join,
    assert_no_shuffle,
    assert_partial_aggregation,
    assert_pushed_filters,
    assert_wholestage_codegen,
)

__all__ = [
    "executed_plan",
    "formatted_plan",
    "assert_broadcast_join",
    "assert_no_shuffle",
    "assert_partial_aggregation",
    "assert_pushed_filters",
    "assert_wholestage_codegen",
]
