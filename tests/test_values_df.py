"""values_df correctness: the VALUES LocalRelation must be value- and
type-equivalent to createDataFrame for every payload the engine and the
operators feed it (ints incl. boundaries, floats incl. exact IEEE
round-trip, strings incl. quotes/backslashes, NULLs, double arrays).
It replaced createDataFrame on hot paths for performance; these tests
pin that the swap is semantics-free.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_mergetree_spark.tables import values_df

COLS = [("i", "bigint"), ("x", "double"), ("s", "string"),
        ("v", "array<double>")]

row_strategy = st.tuples(
    st.one_of(st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)),
    st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False)),
    st.one_of(st.none(), st.text(
        alphabet=st.characters(blacklist_categories=("Cs",),
                               min_codepoint=1, max_codepoint=0x2FF),
        max_size=20)),
    st.one_of(st.none(), st.lists(
        st.floats(allow_nan=False, allow_infinity=False), max_size=4)),
)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(row_strategy, min_size=1, max_size=5))
def test_values_df_roundtrip(spark, rows):
    got = values_df(spark, rows, COLS).collect()
    assert len(got) == len(rows)
    for r, (i, x, s, v) in zip(got, rows):
        assert r["i"] == i
        if x is None:
            assert r["x"] is None
        else:
            assert r["x"] == x or math.isclose(r["x"], x, rel_tol=0, abs_tol=0)
        assert r["s"] == s
        if v is None:
            assert r["v"] is None
        else:
            assert list(r["v"]) == v


def test_values_df_matches_createdataframe_types(spark):
    rows = [(1, 0.1, "a'b\\c", [1.5, -0.0]), (None, None, None, None)]
    a = values_df(spark, rows, COLS)
    b = spark.createDataFrame(rows, "i bigint, x double, s string, v array<double>")
    assert a.dtypes == b.dtypes
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))


def test_values_df_empty(spark):
    df = values_df(spark, [], COLS)
    assert df.count() == 0
    assert df.dtypes == [("i", "bigint"), ("x", "double"),
                         ("s", "string"), ("v", "array<double>")]


def test_values_df_binary_and_timestamp(spark):
    rows = [(b"\x00\xffab", "2024-01-02 03:04:05")]
    df = values_df(spark, rows, [("b", "binary"), ("t", "timestamp")])
    r = df.first()
    assert bytes(r["b"]) == b"\x00\xffab"
    assert r["t"].year == 2024 and r["t"].second == 5
