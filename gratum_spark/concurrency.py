"""spread/collect API shim over partition parallelism.

Reference: LocalConcurrentContext (concurrency/LocalConcurrentContext.
groovy:17-183) — a worker-queue pattern where N threads each run a
private pipeline built by the ``spread`` closure and one collector
thread runs the ``collect`` closure over survivors.

On Spark this machinery is deleted, not ported (SURVEY §3.4): partition
parallelism IS spread, and the collect stage is just more plan. The shim
keeps the reference's API shape so a migrating user's
``ctx.spread{...}.collect{...}.connect()`` maps 1:1:

  * ``spread(fn)``   — fn(Pipeline) -> Pipeline, applied after a
    round-robin repartition to ``workers`` partitions (the thread pool);
  * ``collect(fn)``  — fn(Pipeline) -> Pipeline, applied after
    coalesce(1) (the single collector thread);
  * ``connect(p)``   — wire both onto a pipeline and return it.

Unlike the reference, the result is still lazy and distributed; nothing
here blocks or copies through queues.
"""

from __future__ import annotations

from collections.abc import Callable

from .pipeline import Pipeline

__all__ = ["LocalConcurrentContext"]


class LocalConcurrentContext:
    """API-compatible stand-in for the reference's thread-pool context
    (defaults match LocalConcurrentContext.groovy:32-37: 8 workers)."""

    def __init__(self, workers: int = 8, queue_size: int = 200) -> None:
        # queue_size is accepted for signature parity; Spark's shuffle
        # machinery replaces the bounded queue entirely.
        self.workers = workers
        self.queue_size = queue_size
        self._spread: Callable[[Pipeline], Pipeline] | None = None
        self._collect: Callable[[Pipeline], Pipeline] | None = None

    def spread(self, fn: Callable[[Pipeline], Pipeline]) -> "LocalConcurrentContext":
        self._spread = fn
        return self

    def collect(self, fn: Callable[[Pipeline], Pipeline]) -> "LocalConcurrentContext":
        self._collect = fn
        return self

    def connect(self, pipeline: Pipeline | None = None):
        """Wire spread+collect onto a pipeline. Two forms, matching the
        reference's usage (LocalConcurrentContextTest.groovy:21-43):

        * ``ctx.connect(pipeline)`` — apply directly;
        * ``pipeline.apply(ctx.spread(f).collect(g).connect())`` — no-arg
          form returns the Pipeline -> Pipeline callable for ``apply``.
        """
        if pipeline is None:
            return lambda p: self.connect(p)
        p = pipeline
        if self._spread is not None:
            p = self._spread(p._next(p.df.repartition(self.workers)))
        if self._collect is not None:
            p = self._collect(p._next(p.df.coalesce(1)))
        return p
