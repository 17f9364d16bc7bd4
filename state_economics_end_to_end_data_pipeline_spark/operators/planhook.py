"""Round-body plan capture hook for iterative entries.

Iterative entries materialize every round via ``localCheckpoint``, so
their post-loop ``explain`` shows only a scan over ``LogicalRDD`` -- the
per-round join/aggregate shape (the thing the optimization claims are
about) is invisible in the final plan.  This hook lets a measurement
tool observe each round's INNER DataFrame *before* the checkpoint
severs its lineage, without changing what any query computes:

    from state_economics_end_to_end_data_pipeline_spark.operators import planhook
    planhook.HOOK = lambda tag, df: ...dump df.explain("formatted")...

Loops call ``emit(tag, df)`` on the round body right before its
checkpoint/materialization.  With ``HOOK`` unset (the default, and the
only state outside ``tools/loop_plan_dump.py``) the call is a single
``is None`` check per round -- no planning, no I/O, no behavior change.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame

HOOK: Optional[Callable[[str, DataFrame], None]] = None


def emit(tag: str, df: DataFrame) -> None:
    """Offer one round-body DataFrame to the registered hook (no-op
    when no hook is registered)."""
    if HOOK is not None:
        HOOK(tag, df)
