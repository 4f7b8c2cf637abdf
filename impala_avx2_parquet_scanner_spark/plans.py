"""Physical-plan introspection helpers.

The reference proves its pushdown works by evaluating predicates on
encoded data; on Spark the proof is in the physical plan — PushedFilters
reaching the parquet scan, ReadSchema pruned to selected columns,
broadcast joins where dimensions are small.  Tests assert on these.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter names pushed to the parquet scan (e.g. 'GreaterThan(l_quantity,48.0)')."""
    plan = formatted_plan(df)
    out: list[str] = []
    # greedy-to-line-end: filter bodies may themselves contain brackets,
    # e.g. In(l_returnflag, [A,R])
    for m in re.finditer(r"PushedFilters: \[(.*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(part.strip() for part in _split_top_level(body))
    return out


def _split_top_level(s: str) -> list[str]:
    """Split a PushedFilters body on commas not inside parentheses."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def partition_filters(df: DataFrame) -> list[str]:
    """Partition-directory predicates (metadata pruning — never touch
    file bytes), e.g. '(l_returnflag = R)'."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[(.*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(part.strip() for part in _split_top_level(body))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (projection pruning evidence)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        # split on top-level commas only: parametric types like
        # decimal(12,2) carry commas of their own
        for field in re.split(r",(?![^()<]*[)>])", m.group(1)):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def final_adaptive_plan(df: DataFrame) -> str:
    """Execute the plan and return the POST-execution explain string —
    with AQE on, this is the runtime-replanned physical plan
    (`isFinalPlan=true`): sort-merge joins the static planner had to
    assume (it cannot size an unhinted build side) show up here as the
    BroadcastHashJoins AQE actually ran.  This is the evidence line for
    the de-pinned-hint policy: same broadcast plans at fixture scale,
    shuffle-join degradation reserved for builds that genuinely outgrow
    the threshold."""
    df.collect()
    return formatted_plan(df)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def has_pushed_aggregation(df: DataFrame) -> bool:
    """Metadata-only aggregate (count/min/max from parquet footers)."""
    plan = formatted_plan(df)
    return "PushedAggregation: [" in plan and "PushedAggregation: []" not in plan


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (scale smell test).
    Formatted plans list each operator as `(N) Exchange` in the details
    section; BroadcastExchange prints as its own operator name and is
    deliberately NOT counted (broadcasts are the cheap alternative)."""
    return len(re.findall(r"\(\d+\) Exchange\b", formatted_plan(df)))
