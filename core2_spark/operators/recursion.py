"""Recursion / fixpoint (SURVEY.md §2.7 `:assign` / `:fixpoint` μ).

core2's logical-plan algebra specs a fixpoint operator for Datalog
rules and WITH-RECURSIVE-shaped queries [upstream: core2
`logical_plan.clj`].  Spark has no recursive CTE; the engine runs the
standard semi-naive iteration: keep a frontier of newly-derived rows,
derive the next frontier, anti-join against everything seen, stop when
empty.

Scale notes: each iteration is one distributed join; the accumulated
set is checkpointed every few rounds to truncate the lineage chain
(without it, plan depth grows linearly and planning cost quadratically).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fixpoint(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    key_cols: list[str] | None = None,
    max_iterations: int = 50,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Least fixpoint of ``base ∪ step(·)`` under set semantics.

    ``step`` maps the current frontier to candidate new rows (same
    schema).  ``key_cols`` identify a row (default: all columns).
    """
    keys = key_cols or base.columns
    acc = base.distinct()
    frontier = acc
    persisted: list[DataFrame] = []
    try:
        return _fixpoint_loop(
            acc, frontier, step, keys, max_iterations, checkpoint_every,
            persisted,
        )
    finally:
        # r12 (ADVICE): drain EVERY still-cached frontier on the way
        # out — converged, non-converged (RuntimeError), or a step()
        # failure.  On the converged path the returned acc was eagerly
        # checkpointed first (see below), so unpersisting here never
        # forces a recompute; pre-r12 the frontiers accumulated since
        # the last checkpoint stayed in the CacheManager for the life
        # of the session (benches/suites run many fixpoints).
        for old in persisted:
            old.unpersist()
        persisted.clear()


def _fixpoint_loop(
    acc: DataFrame,
    frontier: DataFrame,
    step,
    keys: list[str],
    max_iterations: int,
    checkpoint_every: int,
    persisted: list[DataFrame],
) -> DataFrame:
    from functools import reduce

    for i in range(max_iterations):
        derived = step(frontier).distinct()
        # NULL-SAFE anti-join: with plain `=`, a derived row holding a
        # NULL key never matches its twin in acc (NULL != NULL), so it
        # is re-derived as "new" forever — the fixpoint diverges and
        # the accumulator grows until OOM on queries every SQL engine
        # answers instantly.  eqNullSafe makes seen-set membership
        # match distinct()'s null-safe grouping semantics.
        d, a = derived.alias("_d"), acc.alias("_a")
        cond = reduce(
            lambda x, y: x & y,
            [F.col(f"_d.{k}").eqNullSafe(F.col(f"_a.{k}")) for k in keys],
        )
        # Materialize the frontier ONCE per iteration (r11, guide §1.2):
        # `new` is consumed by three things — the emptiness check, the
        # accumulator union, and the next iteration's step() — and
        # unmaterialized each of those re-ran the anti-join (and its
        # whole lineage back to the last checkpoint: iteration i
        # recomputed ~i joins per action; the r11 sweep measured the
        # ancestors closure at 15.9 s build + 3.6 s noop at sf0.1,
        # 1.8 s + 0.35 s with this fix).  persist(), not
        # localCheckpoint(): Spark 4.1's eager-checkpoint path hits a
        # `NoSuchElementException: key not found` in the optimizer on
        # iteration ≥2 of exactly this shape (anti-join whose both
        # sides contain the same base relation through an already-
        # checkpointed frontier — reproduced in-session; the every-8
        # acc checkpoint below has never tripped it).  A cached
        # frontier computes each partition once and keeps lineage for
        # fault tolerance; frontiers superseded by an acc checkpoint
        # are unpersisted there.
        new = d.join(a, cond, "left_anti").persist()
        if new.isEmpty():
            new.unpersist()
            # Converged: acc's lineage still threads through the cached
            # frontiers the caller's finally is about to unpersist —
            # materialize it first (the acc-checkpoint shape is the one
            # documented safe against the Spark 4.1 eager-checkpoint
            # optimizer bug; the frontier shape is not).  When no
            # frontier is cached (base was already the fixpoint) acc is
            # self-contained and the extra action would be pure cost.
            if persisted:
                acc = acc.localCheckpoint(eager=True)
            return acc
        acc = acc.unionByName(new)
        persisted.append(new)
        frontier = new
        if (i + 1) % checkpoint_every == 0:
            acc = acc.localCheckpoint(eager=True)
            # acc now materially contains every earlier frontier; only
            # the CURRENT one still feeds the next step().
            for old in persisted[:-1]:
                old.unpersist()
            del persisted[:-1]
    raise RuntimeError(f"fixpoint did not converge in {max_iterations} iterations")
