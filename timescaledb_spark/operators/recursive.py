"""``WITH RECURSIVE`` analog — driver-side fixpoint iteration.

Spark SQL has no recursive CTEs (SURVEY §2.7, the last inherited-PG
surface). The idiomatic Spark shape for the same computations (transitive
closure, hierarchies, iterative expansion) is a driver loop where every
iteration is a fully distributed DataFrame operation — the same pattern
GraphX/Pregel use. The loop only ever moves per-iteration ROW COUNTS to
the driver (an ``isEmpty`` probe), never data.

Scale notes:
- ``localCheckpoint(eager=True)`` after each iteration truncates lineage,
  so the plan does not grow linearly with depth (which would otherwise
  blow analysis time and stack depth around ~50 iterations).
- The UNION-distinct variant diffs each frontier against the accumulated
  set (PG's cycle protection); pass ``union_all=True`` when the step
  function is known acyclic to skip that anti-join shuffle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def recursive_union(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    union_all: bool = False,
    max_iterations: int = 200,
) -> DataFrame:
    """Evaluate ``WITH RECURSIVE r AS (base UNION [ALL] step(r)) SELECT *``.

    ``step`` receives the previous iteration's frontier (PG's "working
    table" semantics, not the full accumulated result) and returns the
    next frontier; iteration stops when a frontier comes back empty.
    """
    from functools import reduce

    if not union_all:
        # UNION-distinct dedups the BASE term too (PG: the working table
        # starts from the deduplicated base); later frontiers dedup via
        # subtract against the accumulator
        base = base.distinct()
    frontier = base.localCheckpoint(eager=True)
    parts = [frontier]

    def acc() -> DataFrame:
        return reduce(lambda a, b: a.unionByName(b), parts)

    for _ in range(max_iterations):
        new = step(frontier)
        if not union_all:
            new = new.subtract(acc())
        # one materializing job per iteration: checkpoint the frontier
        # (truncates lineage) and probe emptiness on the cached result
        new = new.localCheckpoint(eager=True)
        if new.isEmpty():
            return acc()
        parts.append(new)
        frontier = new
    raise RuntimeError(
        f"recursive_union did not converge in {max_iterations} iterations"
    )
