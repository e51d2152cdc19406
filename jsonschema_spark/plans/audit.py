"""Physical-plan guardrails as a public API — the invariants
tests/test_plan_shapes.py pins for this repo's own queries, packaged so a
pipeline can assert them on ITS composed plans before a 100-TB run:

    from jsonschema_spark.plans.audit import assert_plan, plan_report

    assert_plan(df, no_cartesian=True, no_row_python=True,
                no_single_partition=True)

A failed assertion names the offending operator and embeds the plan, so
the error is actionable at submit time instead of as a 3 a.m. straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _plan_text(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_report(df: DataFrame) -> dict:
    """Inspect the executed plan and report the scale-relevant facts:

    - ``cartesian``: a CartesianProduct / BroadcastNestedLoopJoin exists
      (all-pairs blowup at scale)
    - ``row_python``: row-at-a-time Python (BatchEvalPython) on the path
      (10-100x slower than Arrow; ArrowEvalPython / mapInPandas are fine
      and reported separately as ``arrow_python``)
    - ``single_partition``: an Exchange SinglePartition (a global
      sort/window funneling the data through one task)
    - ``exchanges``: shuffle count; ``sort_merge_joins`` /
      ``broadcast_joins``: join strategies chosen
    - ``collects_set``: an unbounded collect_set/collect_list aggregate
      appears (per-group state grows with the data unless the caller
      bounded it)
    """
    plan = _plan_text(df)
    return {
        "cartesian": "CartesianProduct" in plan
        or "BroadcastNestedLoopJoin" in plan,
        "row_python": "BatchEvalPython" in plan,
        "arrow_python": "ArrowEvalPython" in plan
        or "FlatMapGroupsInPandas" in plan
        or "MapInPandas" in plan,
        "single_partition": "SinglePartition" in plan,
        "exchanges": plan.count("Exchange"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "collects_set": "collect_set" in plan or "collect_list" in plan,
    }


def assert_plan(
    df: DataFrame,
    no_cartesian: bool = True,
    no_row_python: bool = True,
    no_single_partition: bool = False,
    max_exchanges: int | None = None,
) -> dict:
    """Assert scale invariants on ``df``'s executed plan; returns the
    :func:`plan_report` on success, raises ``AssertionError`` naming the
    violated invariant (with the plan attached) otherwise.

    ``no_single_partition`` defaults False because bounded-input global
    windows (an O(bins) histogram CDF, a registry-sized rank) are
    legitimate — enable it for corpus-sized plans."""
    rep = plan_report(df)
    plan = _plan_text(df)
    if no_cartesian and rep["cartesian"]:
        raise AssertionError(f"plan contains a cartesian join:\n{plan}")
    if no_row_python and rep["row_python"]:
        raise AssertionError(
            f"plan contains row-at-a-time Python (BatchEvalPython):\n{plan}"
        )
    if no_single_partition and rep["single_partition"]:
        raise AssertionError(
            f"plan funnels through Exchange SinglePartition:\n{plan}"
        )
    if max_exchanges is not None and rep["exchanges"] > max_exchanges:
        raise AssertionError(
            f"plan has {rep['exchanges']} exchanges"
            f" (max {max_exchanges}):\n{plan}"
        )
    return rep
