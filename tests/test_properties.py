"""Property-based tests (hypothesis) for engine invariants.

Beyond the reference's test strategy (inline golden counts only —
SURVEY §5.1 notes the absence of randomized testing): these assert
structural invariants that must hold for ANY input."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gratum_spark import RejectionCategory, sources

# One shared strategy: small tables of (k, v, n) rows
ROW = st.fixed_dictionaries(
    {
        "k": st.sampled_from(["a", "b", "c"]),
        "v": st.one_of(st.none(), st.text(alphabet="xyz0", max_size=3)),
        "n": st.one_of(st.none(), st.integers(-1000, 1000).map(str), st.just("bad")),
    }
)
ROWS = st.lists(ROW, min_size=1, max_size=12)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _pipe(spark, rows):
    return sources.from_collection(spark, rows, "k string, v string, n string")


@given(rows=ROWS)
@SLOW
def test_filter_partition_invariant(spark, rows):
    """loaded + rejected == total for any predicate split."""
    p = _pipe(spark, rows)
    stat = p.filter({"k": "a"}).go()
    assert stat.loaded + stat.rejected == len(rows)
    # the reject stream carries exactly the complement
    kept = stat.loaded
    assert kept == sum(1 for r in rows if r["k"] == "a")


@given(rows=ROWS)
@SLOW
def test_as_int_trichotomy(spark, rows):
    """Every row is exactly one of: parsed, passed-through-null, rejected."""
    p = _pipe(spark, rows)
    stat = p.as_int("n").go()
    n_bad = sum(1 for r in rows if r["n"] == "bad")
    assert stat.rejections_for(RejectionCategory.INVALID_FORMAT) == n_bad
    assert stat.loaded == len(rows) - n_bad


@given(rows=ROWS)
@SLOW
def test_unique_keeps_one_per_key(spark, rows):
    p = _pipe(spark, rows)
    stat = p.unique("k").go()
    distinct = len({r["k"] for r in rows})
    assert stat.loaded == distinct
    assert stat.rejected == len(rows) - distinct


@given(rows=ROWS)
@SLOW
def test_concat_is_length_additive(spark, rows):
    a = _pipe(spark, rows)
    b = _pipe(spark, rows)
    assert a.concat(b).go().loaded == 2 * len(rows)


@given(rows=ROWS)
@SLOW
def test_exact_dedup_idempotent(spark, rows):
    from gratum_spark.operators import dedup

    df = _pipe(spark, rows).df.withColumn(
        "rid", __import__("pyspark.sql.functions", fromlist=["f"]).monotonically_increasing_id()
    )
    once = dedup.exact_dedup(df, ["k", "v"], "rid")
    twice = dedup.exact_dedup(once, ["k", "v"], "rid")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
