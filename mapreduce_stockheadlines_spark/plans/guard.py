"""Plan guard: lint a DataFrame's physical plan for scale anti-patterns
before launching it on real data.

tests/test_plans.py pins the shipped queries; this is the same idea as a
runtime API for ad-hoc plans — a 100 TB job with a cartesian product or
an un-pushed scan filter should fail at submit time, not six hours in.

Checks are string properties of ``explain("formatted")`` output, the
stable user-facing plan surface.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

# Operators that are quadratic (or ship a whole side to every task) and
# are never what you want on corpus-sized inputs.
DEFAULT_FORBIDDEN = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
)


class PlanGuardError(RuntimeError):
    """A scale anti-pattern was found in the physical plan."""


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def check_plan(
    df: DataFrame,
    forbid: tuple[str, ...] = DEFAULT_FORBIDDEN,
    max_shuffles: int | None = None,
    require_pushed_filters: bool = False,
) -> list[str]:
    """Return a list of violations (empty = clean).

    - ``forbid``: operator names that must not appear (default: the
      quadratic joins).
    - ``max_shuffles``: cap on data shuffles (Exchange operators,
      broadcasts excluded) — a plan that shuffles the corpus five times
      usually has a missing pre-partitioning.
    - ``require_pushed_filters``: every file scan that sits under a
      Filter must carry a non-empty PushedFilters list (a selective
      query reading whole files is a silent 100x).
    """
    plan = formatted_plan(df)
    violations: list[str] = []
    for op in forbid:
        if op in plan:
            violations.append(f"forbidden operator in plan: {op}")
    if max_shuffles is not None:
        # count operators in the numbered tree section only (formatted
        # output lists each op once in the tree, once in details)
        tree = plan.split("\n\n")[0]
        shuffles = len(re.findall(r"\bExchange\b", tree)) - len(
            re.findall(r"\bBroadcastExchange\b", tree)
        )
        if shuffles > max_shuffles:
            violations.append(
                f"{shuffles} data shuffles in plan (max {max_shuffles})"
            )
    if require_pushed_filters and "Filter" in plan:
        if "PushedFilters: []" in plan:
            violations.append(
                "scan under a Filter has an empty PushedFilters list"
            )
    return violations


def assert_scalable(df: DataFrame, **kwargs) -> DataFrame:
    """Raise ``PlanGuardError`` listing every violation; returns the
    DataFrame unchanged so it chains into a pipeline."""
    violations = check_plan(df, **kwargs)
    if violations:
        raise PlanGuardError("; ".join(violations))
    return df
