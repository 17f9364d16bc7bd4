"""Order-insensitive exact aggregates.

Plain double ``SUM``/``AVG`` results depend on accumulation order, which
differs run-to-run under parallel partial aggregation -- unacceptable both
for differential testing against an oracle and for reproducible pipelines
at scale. These helpers sum through ``DECIMAL(38, scale)``: exact integer
arithmetic, associative/commutative, so any partition layout (2 cores or
1000 executors) yields the identical result, then cast back to double.

Cost: decimal aggregation is modestly slower than double aggregation but
still JVM-side, codegen-friendly, and partial-aggregable (map-side
combine). For throughput-only paths use plain ``F.sum``; for published /
checked results use these.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def exact_sum(c: Column | str, scale: int = 6) -> Column:
    """Deterministic SUM: values rounded to ``scale`` decimals, summed
    exactly, returned as double."""
    return F.sum(_c(c).cast(f"decimal(38,{scale})")).cast("double")


def exact_avg(c: Column | str, scale: int = 6) -> Column:
    """Deterministic AVG = exact decimal sum / non-null count, as double."""
    col = _c(c)
    return (F.sum(col.cast(f"decimal(38,{scale})")).cast("double") / F.count(col))


def exact_cumsum(c: Column | str, window, scale: int = 6) -> Column:
    """Deterministic running SUM over a window."""
    return F.sum(_c(c).cast(f"decimal(38,{scale})")).over(window).cast("double")
