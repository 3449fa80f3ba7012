"""Full-registry physical-plan anti-pattern audit, as a pytest.

Runs `tools/plan_audit.py`'s sweep over every registered query's
formatted physical plan (r6 VERDICT item 5): no CartesianProduct, no
BroadcastNestedLoopJoin outside the hand-audited scalar/bounded
allowlists, no BatchEvalPython outside the declared row-at-a-time UDF
demo. Making it a test means the allowlist discipline is enforced by
`pytest tests/` on every run instead of by remembering to invoke the
tool.

Plan-only (queries are not executed), but plan CONSTRUCTION side
effects — staging stream sources, writing fixture tables — do run, so
this sweep costs a few minutes. Marked `slow`; deselect with
`-m 'not slow'` for quick iteration.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


@pytest.mark.slow
def test_no_unexplained_plan_antipatterns(spark):
    import plan_audit

    from parquet_playground_spark import registry

    registry.load_all()
    names = list(registry.QUERIES)
    bad = plan_audit.audit(spark, names)
    assert not bad, (
        f"unexplained plan anti-patterns in {len(bad)} quer"
        f"{'y' if len(bad) == 1 else 'ies'}:\n  " + "\n  ".join(bad)
    )
    # the sweep only means something if it saw the whole surface
    assert len(names) == len(registry.QUERIES) >= 424
