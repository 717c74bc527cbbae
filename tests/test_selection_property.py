"""Property-based cross-check of select_by_budget: the bucket scale
path (score-histogram cut + boundary-cell refinement) must reproduce
the exact window path on adversarial inputs — tied scores, tiny score
spans, zero-token rows, groups that fit entirely inside the budget,
and budgets smaller than any single document. A pure-pandas brute
force recomputes the greedy fill (score DESC, key ASC; keep while
cumulative-before < budget) independently of both Spark strategies.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from feathr_spark.operators.selection import select_by_budget

rows = st.lists(
    st.tuples(st.sampled_from(["s0", "s1"]),      # source
              st.integers(0, 7),                  # score (ties likely)
              st.integers(0, 6)),                 # tokens (zeros allowed)
    min_size=0, max_size=24)


def brute(data, budget):
    keep = []
    for src in {d[0] for d in data}:
        grp = [(i, sc, tk) for i, (s, sc, tk) in enumerate(data) if s == src]
        grp.sort(key=lambda r: (-r[1], r[0]))
        cum = 0
        for i, _sc, tk in grp:
            if cum < budget:
                keep.append(i)
            cum += tk
    return sorted(keep)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=rows, budget=st.integers(0, 30), buckets=st.sampled_from([2, 3, 16]))
def test_bucket_matches_window_and_brute(spark, rows, budget, buckets):
    if not rows:
        return
    data = [(i, s, float(sc), tk) for i, (s, sc, tk) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "doc_id long, source string, score double, n_tokens long")
    expected = brute(rows, budget)
    a = sorted(r["doc_id"] for r in select_by_budget(
        df, float(budget), "n_tokens", "score", ["source"],
        method="window").collect())
    b = sorted(r["doc_id"] for r in select_by_budget(
        df, float(budget), "n_tokens", "score", ["source"],
        method="bucket", score_buckets=buckets).collect())
    assert a == expected
    assert b == expected
