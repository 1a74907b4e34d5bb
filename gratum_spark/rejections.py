"""Rejection model: categories, reject-rule bookkeeping, LoadStatistic.

Reference semantics (gratum): any step may reject a row with a category +
reason; rejected rows short-circuit the remaining steps and flow to a
secondary "rejections" pipeline carrying ``rejectionCategory``,
``rejectionReason`` and ``rejectionStep`` columns; ``go()`` returns a
``LoadStatistic`` with loaded count and per-category×step reject counts.
(reference: src/main/groovy/gratum/etl/Rejection.groovy:9-22,
RejectionCategory.groovy:9-17, LoadStatistic.groovy:12-163)

Spark design: each rejecting operator *splits* the lazy plan — main
continues as ``df.filter(pred)``, and ``df.filter(~pred)`` plus the
rejection metadata columns is appended to the pipeline's reject list.
Catalyst pushes the (negated) predicate to the scan on both branches, so
at 100 TB each reject branch is an independent pushed-down scan rather
than a driver-side re-iteration; counts are computed in one union-all
aggregate action at ``go()`` time.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from enum import Enum
from functools import reduce as _reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REJECT_CATEGORY = "rejectionCategory"
REJECT_REASON = "rejectionReason"
REJECT_STEP = "rejectionStep"
REJECT_COLS = (REJECT_CATEGORY, REJECT_REASON, REJECT_STEP)


class RejectionCategory(str, Enum):
    """Mirrors gratum's RejectionCategory enum (RejectionCategory.groovy:9-17)."""

    INVALID_FORMAT = "INVALID_FORMAT"
    MISSING_DATA = "MISSING_DATA"
    DUPLICATE = "DUPLICATE"
    REJECTION = "REJECTION"
    SCRIPT_ERROR = "SCRIPT_ERROR"
    RUNTIME_ERROR = "RUNTIME_ERROR"
    IGNORE_ROW = "IGNORE_ROW"


@dataclass
class Rejection:
    """Return value for row closures that reject the current row
    (reference: Rejection.groovy:9-22 + Pipeline.reject helper).

    A gratum closure calls ``reject(row, reason, category)``; the Python
    closure simply returns ``Rejection(reason, category)`` (or the
    :func:`reject` convenience) — the original row is preserved by the
    step machinery."""

    reason: str = "rejected"
    category: RejectionCategory = RejectionCategory.REJECTION


def reject(
    reason: str = "rejected",
    category: RejectionCategory = RejectionCategory.REJECTION,
) -> Rejection:
    """Convenience mirroring gratum's ``reject(...)`` static helper."""
    return Rejection(reason, category)


def tag_rejects(
    df: DataFrame, category: RejectionCategory, reason: str, step: str
) -> DataFrame:
    """Attach the rejection metadata columns to a rejected-rows DataFrame."""
    return df.withColumns(
        {
            REJECT_CATEGORY: F.lit(category.value),
            REJECT_REASON: F.lit(reason),
            REJECT_STEP: F.lit(step),
        }
    )


def union_rejects(rejects: list[DataFrame]) -> DataFrame | None:
    """Union all reject branches by name, tolerating differing payload schemas."""
    if not rejects:
        return None
    return _reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), rejects
    )


@dataclass
class LoadStatistic:
    """Result of Pipeline.go(): loaded count + reject accounting + timing.

    Mirrors gratum's LoadStatistic (LoadStatistic.groovy:12-163). Per-step
    wall timings exist only for Python-closure steps (add_step, closure
    filters), measured executor-side via accumulators; expression-only
    steps fuse into whole-stage codegen and have no separable time. A
    step's reported ms is the SUM over every plan branch that executed it
    (kept + reject branches may each run the step), so totals are
    APPROXIMATE and can exceed the action's wall-clock.
    """

    name: str
    loaded: int
    start_ms: float
    end_ms: float
    # {category: {step: count}}
    rejections: dict[str, dict[str, int]] = field(default_factory=dict)
    # {step: executor-side Python ms} — closure steps only; see class doc
    step_timings: dict[str, float] = field(default_factory=dict)

    @property
    def duration_ms(self) -> float:
        return self.end_ms - self.start_ms

    @property
    def rejected(self) -> int:
        return sum(c for by_step in self.rejections.values() for c in by_step.values())

    def rejections_for(self, category: RejectionCategory | str) -> int:
        key = category.value if isinstance(category, RejectionCategory) else category
        return sum(self.rejections.get(key, {}).values())

    def rejections_by_step(self, category: RejectionCategory | str) -> dict[str, int]:
        key = category.value if isinstance(category, RejectionCategory) else category
        return dict(self.rejections.get(key, {}))

    def merge(self, other: "LoadStatistic", include_timings: bool = True) -> "LoadStatistic":
        """Fold another run's statistics into this one (reference:
        LoadStatistic.groovy merge, LoadStatisticTest.groovy:9-52) —
        the concurrency-context aggregation primitive. Sums loaded and
        per-category×step reject counts; the merged duration spans both
        runs (min start .. max end). ``include_timings=False`` leaves
        this run's step timings untouched (LoadStatisticTest.groovy
        testMergeWithoutStepTimings — used when the merged pipelines'
        steps are unrelated and summing their timings would mislead).
        Mutates and returns self, like the reference."""
        self.loaded += other.loaded
        for cat, by_step in other.rejections.items():
            mine = self.rejections.setdefault(cat, {})
            for step, n in by_step.items():
                mine[step] = mine.get(step, 0) + n
        self.start_ms = min(self.start_ms, other.start_ms)
        self.end_ms = max(self.end_ms, other.end_ms)
        if include_timings:
            for step, ms in other.step_timings.items():
                self.step_timings[step] = self.step_timings.get(step, 0.0) + ms
        return self

    def __str__(self) -> str:  # pragma: no cover - debug aid
        return (
            f"LoadStatistic(name={self.name!r}, loaded={self.loaded}, "
            f"rejected={self.rejected}, duration={self.duration_ms:.0f}ms)"
        )


def now_ms() -> float:
    return time.time() * 1000.0


# Reference: MAX_ERROR_THRESHOLD = 50 (etl/Step.groovy:9) — a pipeline
# aborts when a step accumulates >50 SCRIPT_ERRORs with 0 loaded rows.
MAX_ERROR_THRESHOLD = 50


class PipelineAbortException(RuntimeError):
    """Raised by go() when SCRIPT_ERROR counts exceed MAX_ERROR_THRESHOLD
    with zero loaded rows (util/PipelineAbortException.java:3-12).

    Under lazy execution the check is post-hoc (after the single counting
    action) rather than mid-stream; the contract — a fully-broken step
    never reports success — is preserved."""
