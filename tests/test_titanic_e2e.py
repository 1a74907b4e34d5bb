"""The reference's canonical end-to-end test, on a synthesized
titanic-shaped CSV (the real file isn't shipped; FIXTURES.md §3 records
the golden invariants: 418 rows, Sex male=266/female=152, quoted names
with embedded commas, empty Age/Fare cells).

Mirrors PipelineTest.groovy:46-66 (filter split), :69-91 (closure
filter on coerced Age) and the concurrency test's inverted filter."""

from __future__ import annotations

import csv

import pytest

from gratum_spark import LocalConcurrentContext, RejectionCategory, sources


@pytest.fixture(scope="module")
def titanic_csv(tmp_path_factory):
    path = tmp_path_factory.mktemp("titanic") / "titanic.csv"
    with open(path, "w", newline="") as f:
        w = csv.writer(f, quoting=csv.QUOTE_MINIMAL)
        w.writerow(
            ["PassengerId", "Pclass", "Name", "Sex", "Age", "SibSp",
             "Parch", "Ticket", "Fare", "Cabin", "Embarked"]
        )
        for i in range(418):
            sex = "male" if i < 266 else "female"
            # deterministic ages: every 5th empty; range 1..80
            age = "" if i % 5 == 0 else str(1 + (i * 7) % 80)
            fare = "" if i % 11 == 0 else f"{(i * 3) % 100}.25"
            w.writerow(
                [892 + i, str(1 + i % 3), f"Doe, Passenger {i}", sex, age,
                 str(i % 3), str(i % 2), f"T{i:05d}", fare, "", "QSC"[i % 3]]
            )
    return str(path)


def test_sex_filter_golden(spark, titanic_csv):
    stat = sources.csv(spark, titanic_csv).filter({"Sex": "male"}).go()
    assert stat.loaded == 266
    assert stat.rejected == 152
    assert stat.rejections_for(RejectionCategory.IGNORE_ROW) == 152


def test_age_closure_filter(spark, titanic_csv):
    # as_int coerces (empty passes as null), closure rejects nulls + >=30
    p = sources.csv(spark, titanic_csv).as_int("Age")
    young = p.filter(lambda r: r["Age"] is not None and r["Age"] < 30)
    stat = young.go()
    rows = young.df.collect()
    assert stat.loaded == len(rows)
    assert all(r["Age"] < 30 for r in rows)
    assert stat.loaded + stat.rejected == 418


def test_concurrent_context_same_goldens(spark, titanic_csv):
    # reference: identical counts under the worker-pool API
    # (LocalConcurrentContextTest.groovy:20-69)
    ctx = LocalConcurrentContext(4, 50)
    out = ctx.spread(lambda p: p.filter({"Sex": "female"})).connect(
        sources.csv(spark, titanic_csv)
    )
    stat = out.go()
    assert stat.loaded == 152
    assert stat.rejected == 266
