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


ASOF_LEFT = st.lists(
    st.tuples(st.sampled_from(["u1", "u2"]), st.integers(0, 100)),
    min_size=1, max_size=10,
)
ASOF_RIGHT = st.lists(
    st.tuples(st.sampled_from(["u1", "u2"]), st.integers(0, 100), st.integers(-5, 5)),
    min_size=1, max_size=10,
)


@given(left=ASOF_LEFT, right=ASOF_RIGHT)
@SLOW
def test_asof_join_matches_python_model(spark, left, right):
    """asof backward join == 'latest right row at-or-before each left
    ts per key' — checked against a brute-force python model for any
    input, including duplicate timestamps and keys with no match."""
    from gratum_spark.operators import joins

    ldf = spark.createDataFrame(left, "k string, ts long")
    # dedupe right on (k, ts) keeping max v to make the model unambiguous
    seen: dict[tuple, int] = {}
    for k, ts, v in right:
        seen[(k, ts)] = max(v, seen.get((k, ts), v))
    rrows = [(k, ts, v) for (k, ts), v in seen.items()]
    rdf = spark.createDataFrame(rrows, "k string, ts long, v long")

    got = {
        (r["k"], r["ts"], r["v"])
        for r in joins.asof_join(
            ldf, rdf, on="k", left_ts="ts", right_ts="ts"
        ).collect()
    }

    expect = set()
    for k, lts in left:
        best = None
        for (rk, rts), v in seen.items():
            if rk == k and rts <= lts and (best is None or rts > best[0]):
                best = (rts, v)
        expect.add((k, lts, best[1] if best else None))
    assert got == expect


JOIN_LEFT_ROWS = st.lists(
    st.tuples(st.integers(0, 4), st.sampled_from(["L1", "L2", None])),
    min_size=1, max_size=8,
)
JOIN_RIGHT_ROWS = st.lists(
    st.tuples(st.integers(0, 6), st.sampled_from(["R1", "R2"]), st.integers(0, 9)),
    min_size=0, max_size=8,
)


@given(lrows=JOIN_LEFT_ROWS, rrows=JOIN_RIGHT_ROWS)
@SLOW
def test_join_matches_reference_model(spark, lrows, rrows):
    """gratum join semantics vs a python model for arbitrary inputs:
    1-to-N multiplication, LEFT-wins column collision on 'v', inner
    rejects of unmatched lefts (Pipeline.groovy:385-427)."""
    left = sources.from_collection(
        spark,
        [{"k": k, "v": v} for k, v in lrows],
        schema="k long, v string",
    )
    rdf = spark.createDataFrame(
        [(k, v, x) for k, v, x in rrows], "k long, v string, x long"
    )

    joined = left.join(rdf, on="k", broadcast=True)
    key = lambda t: (t[0], t[1] or "", t[2])
    got = sorted(
        ((r["k"], r["v"], r["x"]) for r in joined.df.collect()), key=key
    )

    expect = []
    for k, v in lrows:
        matches = [(rk, rv, rx) for rk, rv, rx in rrows if rk == k]
        for _, _, rx in matches:
            expect.append((k, v, rx))  # v = LEFT's value (collision rule)
    assert got == sorted(expect, key=key)

    stat = joined.go()
    n_unmatched = sum(
        1 for k, _ in lrows if not any(rk == k for rk, _, _ in rrows)
    )
    assert stat.loaded == len(expect)
    assert stat.rejected == n_unmatched


@given(rows=ROWS)
@SLOW
def test_add_step_matches_sequential_model(spark, rows):
    """add_step must agree with the obvious sequential interpreter:
    mutate / None-reject / raise-reject per row, independent of Spark's
    partitioning and execution order."""

    def step(row):
        if row["v"] is None:
            return None  # reject
        if row["n"] == "bad":
            raise ValueError("boom")  # SCRIPT_ERROR
        return {**row, "kv": f'{row["k"]}:{row["v"]}'}

    # sequential reference model
    expected_kept, expected_rejected, expected_errors = [], 0, 0
    for r in rows:
        if r["v"] is None:
            expected_rejected += 1
        elif r["n"] == "bad":
            expected_errors += 1
        else:
            expected_kept.append(f'{r["k"]}:{r["v"]}')

    p = _pipe(spark, rows).add_step("model", step, schema="k string, v string, n string, kv string")
    stat = p.go()
    assert stat.loaded == len(expected_kept)
    assert stat.rejections_for(RejectionCategory.REJECTION) == expected_rejected
    assert stat.rejections_for(RejectionCategory.SCRIPT_ERROR) == expected_errors
    assert sorted(r["kv"] for r in p.df.collect()) == sorted(expected_kept)


@given(rows=ROWS)
@SLOW
def test_prepend_step_equals_pre_registration(spark, rows):
    """prepend_step(f) after registering ops == add_step(f) before them."""

    def tag(row):
        return {**row, "t": (row["v"] or "") + "!"}

    base = _pipe(spark, rows)
    a = base.filter({"k": ["a", "b"]}).prepend_step("tag", tag, schema="k string, v string, n string, t string")
    b = base.add_step("tag", tag, schema="k string, v string, n string, t string").filter({"k": ["a", "b"]})
    def key(rows_):
        return sorted((tuple(r) for r in rows_), key=repr)

    ra = key(a.df.select("k", "v", "n", "t").collect())
    rb = key(b.df.select("k", "v", "n", "t").collect())
    assert ra == rb


@given(rows=st.lists(st.fixed_dictionaries({
    "g": st.sampled_from(["p", "q"]),
    "x": st.one_of(st.none(), st.text(alphabet="ab", min_size=1, max_size=2)),
}), min_size=1, max_size=10))
@SLOW
def test_fill_down_decider_matches_sequential_model(spark, rows):
    """Closure fill_down_by must equal the reference's sequential loop."""
    rows = [{"i": i, **r} for i, r in enumerate(rows)]

    # sequential model (reference Pipeline.groovy:437-455 semantics)
    expected, prev = [], None
    for r in rows:
        cur = dict(r)
        if prev is not None and cur["g"] == prev["g"]:
            for c in ("x",):
                if cur[c] is None or cur[c] == "":
                    cur[c] = prev[c]
        expected.append(cur["x"])
        prev = cur

    p = sources.from_collection(
        spark, rows, "i long, g string, x string", name="fdp", ordered=True
    ).fill_down_by(
        lambda row, prev_row: row["g"] == prev_row["g"]
    )
    got = [r["x"] for r in sorted(p.df.collect(), key=lambda r: r["i"])]
    assert got == expected


@given(
    vals=st.lists(
        st.one_of(st.none(), st.sampled_from(["a", "b"])), min_size=1, max_size=30
    )
)
@SLOW
def test_flatten_window_runs_match_sequential_model(spark, vals):
    """flatten_window's distributed run-stitching must reproduce the
    sequential consecutive-runs model for ANY value sequence — a 2-letter
    (+None) alphabet over ~4-row range partitions forces runs across
    partition boundaries, including null-valued runs (None==None is one
    run, Groovy == semantics)."""
    rows = [{"i": i, "g": g} for i, g in enumerate(vals)]

    expected = []
    run_val, run_len = vals[0], 1
    for g in vals[1:]:
        if g == run_val:
            run_len += 1
        else:
            expected.append((run_val, run_len))
            run_val, run_len = g, 1
    expected.append((run_val, run_len))

    def summarize(pdf):
        return pdf.groupby("g", as_index=False, dropna=False).agg(n=("i", "count"))

    p = sources.from_collection(spark, rows, "i long, g string").flatten_window(
        "g", summarize, "g string, n long", order_by="i"
    )
    key = lambda t: (t[0] is None, t[0] or "", t[1])  # noqa: E731
    got = sorted(((r["g"], r["n"]) for r in p.df.collect()), key=key)
    assert got == sorted(expected, key=key)
