"""Property-based cross-check of the FDS tensor encoding.

Hypothesis generates adversarial term maps — float-parseable vs
non-parseable term mixes (the all-or-nothing sort rule's exact trigger
surface), duplicate numeric VALUES under distinct string terms, empty
maps, nulls — and a pure-Python model recomputes the reference ordering
(FDSConversionUtils.scala:405-427: float order iff EVERY term parses as
a float, else lexical; rank-2 applies the rule per dimension then sorts
by (dim0, dim1) — FeaturizedDatasetUtils.scala:364-390). The Catalyst
projection must match the model exactly.

The reference ships no property-based tests (SURVEY.md §5).
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from feathr_spark.functions import fds

# term pool mixes float-parseable ("2", "10", "-1.5", "1e3") with
# non-parseable ("a", "x2", "") — "1e3"/"-1.5" are the adversarial
# cases where lexical and numeric order disagree hard
TERMS = ["2", "10", "-1.5", "1e3", "0", "a", "x2", "b10"]
NUMERIC_TERMS = {"2", "10", "-1.5", "1e3", "0"}

term_maps = st.dictionaries(st.sampled_from(TERMS),
                            st.integers(-3, 3).map(float),
                            min_size=0, max_size=6)


def _model_sort(entries):
    """Reference term ordering: float order iff every term parses."""
    all_num = all(t in NUMERIC_TERMS for t, _ in entries)
    if all_num:
        return sorted(entries, key=lambda e: float(e[0]))
    return sorted(entries, key=lambda e: e[0])


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(tv=term_maps)
def test_term_vector_order_matches_model(spark, tv):
    df = spark.createDataFrame([(1, tv if tv else None)],
                               "id int, tv map<string,double>")
    out, types = fds.to_fds(df, ["tv"])
    assert types["tv"] == fds.TERM_VECTOR
    got = out.collect()[0].tv
    if not tv:
        assert got is None
        return
    want = _model_sort(list(tv.items()))
    assert got.indices0 == [t for t, _ in want]
    assert got["values"] == pytest.approx([v for _, v in want])


outer_maps = st.dictionaries(
    st.sampled_from(TERMS),
    st.dictionaries(st.sampled_from(TERMS), st.integers(-3, 3).map(float),
                    min_size=1, max_size=3),
    min_size=0, max_size=4)


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(tv2=outer_maps)
def test_rank2_coo_order_matches_model(spark, tv2):
    df = spark.createDataFrame(
        [(1, tv2 if tv2 else None)],
        "id int, tv2 map<string,map<string,double>>")
    out, types = fds.to_fds(df, ["tv2"])
    assert types["tv2"] == fds.SPARSE_TENSOR_2D
    got = out.collect()[0].tv2
    if not tv2:
        assert got is None
        return
    coo = [(k0, k1, v) for k0, inner in tv2.items()
           for k1, v in inner.items()]
    num0 = all(k0 in NUMERIC_TERMS for k0, _, _ in coo)
    num1 = all(k1 in NUMERIC_TERMS for _, k1, _ in coo)

    def key(e):
        k0, k1, _ = e
        return ((float(k0),) if num0 else (k0,),
                (float(k1),) if num1 else (k1,))

    want = sorted(coo, key=key)
    assert got.indices0 == [e[0] for e in want]
    assert got.indices1 == [e[1] for e in want]
    assert got["values"] == pytest.approx([e[2] for e in want])


# -- corpus_diff property check (same file: shares the spark fixture) ------

diff_tables = st.tuples(
    st.dictionaries(st.integers(0, 9), st.sampled_from(["p", "q", "r"]),
                    min_size=0, max_size=8),
    st.dictionaries(st.integers(0, 9), st.sampled_from(["p", "q", "r"]),
                    min_size=0, max_size=8),
)


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(tables=diff_tables)
def test_corpus_diff_matches_model(spark, tables):
    from feathr_spark.operators.corpus import corpus_diff

    old_map, new_map = tables
    old = spark.createDataFrame(
        [(k, v) for k, v in old_map.items()] or [(None, None)],
        "doc_id int, text string").where("doc_id is not null")
    new = spark.createDataFrame(
        [(k, v) for k, v in new_map.items()] or [(None, None)],
        "doc_id int, text string").where("doc_id is not null")
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff(old, new).collect()}
    want = {}
    for k in set(old_map) | set(new_map):
        if k not in old_map:
            want[k] = "added"
        elif k not in new_map:
            want[k] = "removed"
        elif old_map[k] == new_map[k]:
            want[k] = "unchanged"
        else:
            want[k] = "changed"
    assert got == want
