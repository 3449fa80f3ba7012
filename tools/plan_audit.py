"""Repo-wide physical-plan anti-pattern audit.

Sweeps every registered query's formatted physical plan and flags the
shapes that do not survive a 100x scale-up:

  * CartesianProduct / BroadcastNestedLoopJoin with a non-trivial
    build side (all-pairs work on a corpus-scaled axis),
  * row-at-a-time Python eval (BatchEvalPython) in any plan.

Declared exceptions are allowlisted with the reason inline — the
audit's value is that every exception is explicit, so a new
accidental cross join fails loudly instead of hiding among the 400+
plans. Plan-only: queries are NOT executed (side effects from plan
construction — staging a stream source, computing broadcast
centroids — do run, same as the per-query plan tests).

Usage: python tools/plan_audit.py [name ...]
Exit 0 = no unexplained anti-pattern.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"

# name -> reason the flagged shape is the declared/correct design.
ALLOWED_NESTED_LOOP = {
    # the declared cross-join surface itself
    "join_cross": "the operator IS a cross join (bounded dims)",
    # scalar/bounded build sides: BroadcastNestedLoopJoin over a
    # 1-row aggregate or a K-row constant frame is a crossJoin of a
    # driver-sized scalar, not all-pairs work
    "join_theta_range": "theta join on inequality — bounded dim side",
    "join_interval_overlap": "interval theta join — bounded calendar",
    # all-pairs over the _MMR_CAND-row candidate set (K is a design
    # constant, not a corpus axis): the greedy MMR similarity matrix
    "sim_search_mmr_rerank": "bounded candidate-set pair matrix",
}

# BatchEvalPython: the deliberately-registered row-at-a-time UDF demo.
ALLOWED_PYTHON = {
    "udf_python_scalar": "the declared row-at-a-time J-category demo",
}


def main() -> int:
    from parquet_playground_spark import registry
    from parquet_playground_spark.plans.inspect import formatted_plan
    from parquet_playground_spark.session import get_spark

    registry.load_all()
    spark = get_spark("plan-audit")

    names = sys.argv[1:] or list(registry.QUERIES)
    bad: list[str] = []
    for name in names:
        try:
            plan = formatted_plan(registry.QUERIES[name](spark, SF_DIR))
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            bad.append(f"{name}: PLAN ERROR {type(exc).__name__}: {exc}")
            continue
        if "CartesianProduct" in plan and name not in ALLOWED_NESTED_LOOP:
            bad.append(f"{name}: CartesianProduct")
        if (
            "BroadcastNestedLoopJoin" in plan
            and name not in ALLOWED_NESTED_LOOP
        ):
            # BNLJ over a broadcast 1-row aggregate is the standard
            # scalar crossJoin plan — only flag when the broadcast side
            # is not an aggregate (heuristic: no HashAggregate or
            # TakeOrderedAndProject feeding the BroadcastExchange would
            # require deeper parsing; keep the audit conservative and
            # list the query for human review instead).
            n_bnlj = plan.count("BroadcastNestedLoopJoin")
            print(f"review {name}: {n_bnlj}x BroadcastNestedLoopJoin")
        if "BatchEvalPython" in plan and name not in ALLOWED_PYTHON:
            bad.append(f"{name}: BatchEvalPython")
    print(f"\naudited {len(names)} plans")
    if bad:
        print("FAILED:")
        for b in bad:
            print(" ", b)
        return 1
    print("no unexplained CartesianProduct / BatchEvalPython")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
