"""Catalog-wide physical-plan lint (r10).

Two anti-patterns are NEVER acceptable anywhere in the 188-entry catalog,
independent of what any single operator's docs promise:

- ``CartesianProduct`` — an unconstrained all-pairs join. Every
  ``crossJoin`` in the repo is a one-row/kilobyte broadcast-back
  aggregate, which the planner renders as BroadcastNestedLoopJoin over a
  single-row side — the moment one degrades to CartesianProduct, a
  data-sized side slipped into a cross join.
- ``BatchEvalPython`` — a row-at-a-time (non-Arrow) Python UDF. The
  repo's Python-side compute is exclusively Arrow-batched
  (ArrowEvalPython / mapInPandas / applyInPandas, which plan as
  MapInPandas/FlatMapGroupsInPandas nodes); a BatchEvalPython node means
  someone registered a plain ``F.udf`` into a hot path.

The sweep explains EVERY catalog entry at the smallest fixture, so a new
entry (or an edit to a shared helper) that introduces either node fails
CI with the entry named — the audit VERDICT performs by hand each round,
mechanized.
"""

from tranquility_spark.catalog import CATALOG

_FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def test_no_forbidden_plan_nodes_anywhere(spark, sf_dir):
    flagged = {}
    failed = {}
    for name, entry in CATALOG.items():
        try:
            plan = (
                entry.fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as ex:  # noqa: BLE001 — collect, then report all
            failed[name] = f"{type(ex).__name__}: {ex}"[:200]
            continue
        hits = [f for f in _FORBIDDEN if f in plan]
        if hits:
            flagged[name] = hits
    assert not failed, f"entries failed to plan: {failed}"
    assert not flagged, f"forbidden plan nodes: {flagged}"
