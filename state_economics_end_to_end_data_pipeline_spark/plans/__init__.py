"""Query catalog: every operator from SURVEY.md section 2 (and the LLM
data-pipeline extensions) as a named query over the driver testdata, each
paired with a DuckDB oracle SQL for differential correctness checking.

Registry contract (mirrors ``__spark_entry__.py``):
- ``QUERIES[name].fn(spark, sf_dir) -> DataFrame`` -- the Spark-engine query
- ``QUERIES[name].oracle`` -- equivalent SQL runnable by DuckDB over views
  named after the parquet tables (or None for non-SQL-expressible ops)

Column names are aliased identically on both sides (the driver sorts
columns by name before value-hashing). Floating aggregates go through
decimal-exact summation (functions.aggregates) so results are
order-insensitive and engine-exact.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str
    # True when BUILDING the entry's DataFrame already executes Spark jobs
    # (iterative localCheckpoint loops, percentile-cutpoint collection,
    # codebook/centroid collects, bounded-stream replay).  Generic catalog
    # consumers (plan dumpers, schema walkers) consult this to skip or
    # defer entries whose construction is not side-effect-free; several
    # entries additionally expose a `cuts`/explain-only escape hatch to
    # build lazily (see robust_stats.collect_value_cutpoints).
    eager_build: bool = False


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, eager_build: bool = False):
    def deco(fn):
        QUERIES[name] = Query(
            fn=fn, oracle=oracle, doc=fn.__doc__ or "", eager_build=eager_build
        )
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import all catalog modules (side effect: fills QUERIES)."""
    from dataclasses import replace

    from . import catalog  # noqa: F401
    from . import extensions  # noqa: F401
    from . import streaming_queries  # noqa: F401
    from . import event_analytics  # noqa: F401
    from . import graph_analytics  # noqa: F401
    from . import layout  # noqa: F401
    from . import robust_stats  # noqa: F401
    from . import tpch_workloads  # noqa: F401

    # Naming contract enforced HERE (after every module has registered,
    # so entries added to any module are covered): a stream_* entry
    # REPLAYS its bounded stream when the DataFrame is built
    # (availableNow trigger drained at construction), so building one is
    # never side-effect-free and generic catalog consumers must see
    # eager_build regardless of whether the registration said so.
    for name, q in QUERIES.items():
        if name.startswith("stream_") and not q.eager_build:
            QUERIES[name] = replace(q, eager_build=True)

    return QUERIES
